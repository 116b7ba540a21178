"""Multi-device sharded GN on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from graph_slam_tpu.datasets import make_sphere_graph
from graph_slam_tpu.graph import gn_optimize, total_error
from graph_slam_tpu.parallel import (
    make_mesh,
    pad_graph_for_mesh,
    sharded_gn,
    sharded_gn_step,
)


def test_sharded_gn_matches_single_device():
    assert len(jax.devices()) == 8
    graph, values, _ = make_sphere_graph(n_poses=48, edges_per_pose=3.0,
                                         seed=0, dtype=jnp.float32,
                                         bucket=16)
    mesh = make_mesh(8)
    vals_sh, err_sh = sharded_gn(mesh, graph, values, iterations=6,
                                 damping=1e-4)
    res = gn_optimize(graph, values, iterations=6, solver="dense",
                      damping=1e-4)
    np.testing.assert_allclose(float(err_sh), float(res.error), rtol=1e-3)
    np.testing.assert_allclose(np.asarray(vals_sh.pose_t),
                               np.asarray(res.values.pose_t), atol=1e-3)


def test_pad_graph_for_mesh_divisibility():
    graph, values, _ = make_sphere_graph(n_poses=10, edges_per_pose=2.0,
                                         seed=1, dtype=jnp.float32,
                                         bucket=16)
    padded = pad_graph_for_mesh(graph, 8)
    for tab in padded:
        cap = tab.active.shape[0]
        assert cap % 8 == 0 or cap == 0
    # padding preserves the error
    e1 = float(total_error(graph, values))
    e2 = float(total_error(padded, values))
    assert abs(e1 - e2) < 1e-6 * max(e1, 1.0)
