"""Chordal initialization: exact recovery, optimum-reaching, SO(3) validity.

The reference starts every batch solve from odometry-composed initials
(gtsam_graph.cpp:655-668) and pays for it in LM iterations; GTSAM's own
answer is InitializePose3 (chordal relaxation), which the reference never
calls. These tests pin the TPU-native equivalent
(`graph_slam_tpu/graph/init.py`).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from graph_slam_tpu.datasets import make_sphere_graph
from graph_slam_tpu.graph import (
    chordal_initialize,
    gn_optimize,
    project_so3,
    total_error,
)
from graph_slam_tpu.pipelines import run_pose_graph
from graph_slam_tpu.pipelines.posegraph import build_pose_graph


def test_noise_free_exact_recovery():
    """With exact measurements the chordal solution IS the ground truth."""
    graph, values, (Rs, ts) = make_sphere_graph(
        n_poses=150, edges_per_pose=3.0, meas_noise=0.0, init_noise=0.5,
        seed=0, dtype=jnp.float64, bucket=64)
    assert float(total_error(graph, values)) > 1e3   # init is far off
    v1 = chordal_initialize(graph, values)
    assert float(total_error(graph, v1)) < 1e-8
    n = 150
    np.testing.assert_allclose(np.asarray(v1.pose_R[:n]), Rs, atol=1e-8)
    np.testing.assert_allclose(np.asarray(v1.pose_t[:n]), ts, atol=1e-5)


def test_rotations_are_valid():
    graph, values, _ = make_sphere_graph(
        n_poses=100, edges_per_pose=3.0, seed=3, dtype=jnp.float64,
        bucket=64)
    v1 = chordal_initialize(graph, values)
    R = np.asarray(v1.pose_R[:100])
    np.testing.assert_allclose(
        R @ R.transpose(0, 2, 1), np.broadcast_to(np.eye(3), R.shape),
        atol=1e-10)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-10)


def test_reaches_optimum_in_few_gn_iters():
    """chordal + 3 GN matches 50-GN-from-odometry on a noisy sphere."""
    graph, values, _ = make_sphere_graph(
        n_poses=300, edges_per_pose=3.0, seed=1, dtype=jnp.float64,
        bucket=64)
    v1 = chordal_initialize(graph, values)
    assert float(total_error(graph, v1)) < 0.05 * float(
        total_error(graph, values))
    fast = gn_optimize(graph, v1, iterations=3)
    slow = gn_optimize(graph, values, iterations=50)
    assert float(fast.error) <= 1.001 * float(slow.error)


def test_f32_under_jit():
    graph, values, _ = make_sphere_graph(
        n_poses=120, edges_per_pose=3.0, seed=2, dtype=jnp.float32,
        bucket=64)
    v1 = chordal_initialize(graph, values)   # jitted entry
    assert v1.pose_R.dtype == jnp.float32
    e0, e1 = float(total_error(graph, values)), float(total_error(graph, v1))
    assert e1 < 0.1 * e0


def test_unused_slots_preserved():
    """Arena padding beyond num_poses must pass through untouched."""
    graph, values, _ = make_sphere_graph(
        n_poses=50, edges_per_pose=2.5, seed=4, dtype=jnp.float64,
        bucket=64)
    v1 = chordal_initialize(graph, values)
    np.testing.assert_array_equal(np.asarray(v1.pose_R[50:]),
                                  np.asarray(values.pose_R[50:]))
    np.testing.assert_array_equal(np.asarray(v1.pose_t[50:]),
                                  np.asarray(values.pose_t[50:]))
    assert int(v1.num_poses) == int(values.num_poses)


def test_project_so3_roundtrip():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(8, 3, 3))
    R = np.asarray(project_so3(jnp.asarray(A)))
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1),
                               np.broadcast_to(np.eye(3), R.shape),
                               atol=1e-10)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-10)
    # projecting a rotation returns it
    np.testing.assert_allclose(np.asarray(project_so3(jnp.asarray(R))), R,
                               atol=1e-10)


def test_run_pose_graph_init_chordal(tmp_path):
    """Pipeline wiring: init='chordal' runs and matches the default optimum."""
    from graph_slam_tpu.config import SlamParams
    from graph_slam_tpu.io import VROLog, read_vro_log, write_vro_log

    # synthetic VRO log: a short loop
    import np_lie
    from graph_slam_tpu.core import se3
    n = 20
    gt = [(np_lie.so3_exp([0, 0, 2 * np.pi * k / n]),
           np.array([np.cos(2 * np.pi * k / n),
                     np.sin(2 * np.pi * k / n), 0.0])) for k in range(n)]

    def rel(i, j):
        Ri, ti = gt[i]
        Rj, tj = gt[j]
        T = se3.Pose(jnp.asarray(Ri.T @ Rj), jnp.asarray(Ri.T @ (tj - ti)))
        return np.asarray(se3.logmap(T))

    info = np.eye(6) * 100
    rows = [(k, k - 1, rel(k - 1, k), info) for k in range(1, n)]
    rows.append((n - 1, 0, rel(0, n - 1), info))
    log = VROLog(np.asarray([r[0] for r in rows]),
                 np.asarray([r[1] for r in rows]),
                 np.stack([r[2] for r in rows]),
                 np.stack([r[3] for r in rows]))
    path = tmp_path / "vro.log"
    write_vro_log(str(path), log)

    res_c = run_pose_graph(read_vro_log(str(path)), SlamParams(),
                           bucket=32, init="chordal")
    res_o = run_pose_graph(read_vro_log(str(path)), SlamParams(), bucket=32)
    assert res_c.error <= res_o.error + 1e-6
    with pytest.raises(ValueError):
        run_pose_graph(read_vro_log(str(path)), SlamParams(), bucket=32,
                       init="nope")
