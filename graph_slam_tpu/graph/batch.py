"""Batched multi-graph solving: one compiled program optimizes a fleet.

A TPU-native throughput lever with no counterpart in the reference (one
estimator per process, one graph at a time, ``gtsam/gtsam_graph.cpp``):
because the arenas are struct-of-arrays with static padded shapes, K
same-capacity graphs are just a leading batch axis — ``vmap`` turns the
whole Gauss–Newton loop (linearization, assembly, solve, retract) into a
single fused device program with K-fold arithmetic intensity. Two roles:

- **serving**: many concurrent SLAM sessions solved per dispatch (the
  reference would run K processes);
- **sweeps**: multi-seed / multi-noise Monte-Carlo studies of the same
  graph shape.

``sharded_gn_many`` adds the second mesh dimension: the batch axis is
data-parallel across chips (no collectives at all — graphs are
independent), composing with the per-graph vmap.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .factors import FactorGraph
from .lm import LMResult, gn_optimize
from .variables import VariableArena

__all__ = [
    "stack_pytrees",
    "unstack_pytree",
    "gn_optimize_many",
    "solve_many",
    "sharded_gn_many",
]


def stack_pytrees(items):
    """Stack a list of identically-shaped pytrees along a new axis 0."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *items)


def unstack_pytree(tree, n: int):
    """Inverse of :func:`stack_pytrees`: a list of ``n`` unbatched trees."""
    return [jax.tree.map(lambda x: x[k], tree) for k in range(n)]


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "solver", "damping", "pcg_iters"),
)
def gn_optimize_many(graphs: FactorGraph, values: VariableArena,
                     iterations: int = 10, solver: str = "pcg",
                     damping: float = 0.0,
                     pcg_iters: int = 250) -> LMResult:
    """Fixed-trip GN over a BATCH of graphs (leading axis on every leaf).

    All graphs must share arena capacities and factor-table buckets (pad
    with :func:`graph.round_up` buckets as usual — masking keeps the math
    exact). Returns a batched :class:`LMResult` whose leaves carry the
    batch axis.
    """

    def one(graph, vals):
        res = gn_optimize(graph, vals, iterations=iterations, solver=solver,
                          damping=damping, pcg_iters=pcg_iters)
        return LMResult(res.values, res.error, res.iterations, res.lam,
                        res.converged)

    return jax.vmap(one)(graphs, values)


def solve_many(pairs, iterations: int = 10, solver: str = "pcg",
               damping: float = 0.0, pcg_iters: int = 250):
    """Host convenience: ``[(graph, values), ...]`` -> ``[LMResult, ...]``.

    Stacks, runs :func:`gn_optimize_many`, unstacks. Raises if the graphs
    do not share static shapes (vmap would otherwise produce a confusing
    stack error).
    """
    graphs = [g for g, _ in pairs]
    arenas = [v for _, v in pairs]
    first = jax.tree.map(jnp.shape, graphs[0])
    for g in graphs[1:]:
        if jax.tree.map(jnp.shape, g) != first:
            raise ValueError(
                "solve_many requires identical bucket/capacity shapes "
                "across graphs; rebuild with a common bucket")
    res = gn_optimize_many(stack_pytrees(graphs), stack_pytrees(arenas),
                           iterations=iterations, solver=solver,
                           damping=damping, pcg_iters=pcg_iters)
    return unstack_pytree(res, len(pairs))


def sharded_gn_many(mesh, graphs: FactorGraph, values: VariableArena,
                    iterations: int = 10, solver: str = "pcg",
                    damping: float = 0.0, pcg_iters: int = 250) -> LMResult:
    """Batch-of-graphs GN with the BATCH axis sharded over a device mesh.

    Pure data parallelism over independent problems: zero collectives,
    linear scaling over ICI. The batch size must be divisible by the mesh
    size. (Contrast ``parallel.sharded_gn``, which shards the FACTORS of
    one large graph and psums per CG iteration.)
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = mesh.axis_names[0]
    n = mesh.devices.size
    b = jax.tree_util.tree_leaves(values)[0].shape[0]
    if b % n:
        raise ValueError(f"batch {b} not divisible by mesh size {n}")
    shard = NamedSharding(mesh, P(axis))
    graphs = jax.tree.map(lambda x: jax.device_put(x, shard), graphs)
    values = jax.tree.map(lambda x: jax.device_put(x, shard), values)
    return gn_optimize_many(graphs, values, iterations=iterations,
                            solver=solver, damping=damping,
                            pcg_iters=pcg_iters)
