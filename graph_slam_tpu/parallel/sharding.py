"""Multi-device execution: factor-sharded Gauss-Newton over a device mesh.

The reference is single-process (SURVEY.md §2.7); its only parallelism is a
Qt thread pool. The TPU-native scaling story for sphere2500-class graphs is
data parallelism over *factors*: every factor table is sharded along its
leading axis across the mesh, values are replicated, each device computes
its shard's contribution to (H, g) = (J^T J, J^T r), and one ``psum`` over
ICI reduces the normal equations; the (small, dense) solve and retract are
replicated. Communication per GN iteration: one all-reduce of H — the
minimal possible for exact GN.

Implemented with ``shard_map`` over a 1-D mesh; works on any backend, tested
on the 8-way virtual CPU mesh in CI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax>=0.5 moved shard_map out of experimental
    from jax.experimental.shard_map import shard_map
except ImportError:  # pragma: no cover
    from jax.shard_map import shard_map

from ..graph.factors import FactorGraph, linearize_blocks, total_error
from ..graph.solve import solve_dense
from ..graph.variables import VariableArena, retract_all, used_slot_mask

__all__ = ["make_mesh", "shard_graph", "sharded_gn_step", "sharded_gn",
           "pad_graph_for_mesh"]

AXIS = "factors"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(devs[:n], (AXIS,))


def pad_graph_for_mesh(graph: FactorGraph, n: int) -> FactorGraph:
    """Pad every factor table to a multiple of the mesh size."""

    def pad_table(tab):
        cap = tab.active.shape[0]
        new_cap = ((cap + n - 1) // n) * n if cap else 0
        if new_cap == cap:
            return tab
        extra = new_cap - cap

        def pad_leaf(x):
            pad_width = [(0, extra)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, pad_width)

        return type(tab)(*[pad_leaf(x) for x in tab])

    return FactorGraph(*[pad_table(t) for t in graph])


def shard_graph(graph: FactorGraph, mesh: Mesh):
    """Place factor tables sharded over the mesh, for HBM savings at scale."""
    sharding = NamedSharding(mesh, P(AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), graph)


def _gn_local(graph: FactorGraph, values: VariableArena, damping):
    """Per-device shard contribution + psum + replicated solve."""
    blocks = linearize_blocks(graph, values)
    mask = used_slot_mask(values)
    dim = mask.shape[0]
    H = jnp.zeros((dim, dim), dtype=mask.dtype)
    g = jnp.zeros(dim, dtype=mask.dtype)
    for r, J, cols in blocks:
        Hf = jnp.einsum("fei,fej->fij", J, J)
        gf = jnp.einsum("fei,fe->fi", J, r)
        H = H.at[cols[:, :, None], cols[:, None, :]].add(Hf)
        g = g.at[cols].add(gf)
    H = jax.lax.psum(H, AXIS)
    g = jax.lax.psum(g, AXIS)
    H = H + jnp.diag(1.0 - mask)
    delta = solve_dense(H, g, damping)
    return retract_all(values, delta)


def sharded_gn_step(mesh: Mesh):
    """Build a jitted one-iteration GN step over the mesh.

    Factor tables sharded on their leading axis (capacities must divide the
    mesh size — see ``pad_graph_for_mesh``); values replicated.
    """
    fn = shard_map(
        _gn_local,
        mesh=mesh,
        in_specs=(P(AXIS), P(), P()),
        out_specs=P(),
    )
    return jax.jit(fn)


def sharded_gn(mesh: Mesh, graph: FactorGraph, values: VariableArena,
               iterations: int = 8, damping: float = 0.0):
    """Run ``iterations`` sharded GN steps; returns (values, final_error)."""
    graph = pad_graph_for_mesh(graph, len(mesh.devices.flat))
    step = sharded_gn_step(mesh)
    damping = jnp.asarray(damping, values.pose_t.dtype)
    for _ in range(iterations):
        values = step(graph, values, damping)
    return values, total_error(graph, values)
