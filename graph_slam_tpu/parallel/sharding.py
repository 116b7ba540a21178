"""Multi-device execution: factor-sharded Gauss-Newton over a device mesh.

The reference is single-process (SURVEY.md §2.7); its only parallelism is a
Qt thread pool. The TPU-native scaling story for sphere2500-class graphs is
data parallelism over *factors*: every factor table is sharded along its
leading axis across the mesh, values are replicated, and each device
computes its shard's contribution to the normal equations.

Two solver paths:

- ``sharded_gn_pcg_step`` (the scalable default): **matrix-free PCG**.
  Nothing of size D^2 ever exists. Per GN step the devices psum the
  gradient (D) and the 3x3-aligned block-Jacobi diagonal (3D); each CG
  iteration then psums ONE tangent-dim vector — the Hessian-vector product
  assembled from the local per-factor J^T J blocks. Collective volume per
  step is O(D * pcg_iters), vs O(D^2) for a dense-H all-reduce (~940 MB at
  sphere2500 in f32 — the round-1 design this replaces).
- ``sharded_gn_step``: dense-H psum + replicated Cholesky. Exact GN in one
  collective; only for small graphs.

Implemented with ``shard_map`` over a 1-D mesh; works on any backend, tested
on the 8-way virtual CPU mesh at sphere2500 scale (tests/test_sharding.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax>=0.5 moved shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..graph.factors import FactorGraph, linearize_blocks, total_error
from ..graph.solve import inv33, solve_dense, solve_pcg_precond
from ..graph.variables import (VariableArena, layout_of, retract_all,
                               used_slot_mask)

__all__ = ["make_mesh", "shard_graph", "sharded_gn_step",
           "sharded_gn_pcg_step", "sharded_gn", "pad_graph_for_mesh",
           "sharded_ba_sqrt"]

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


def _gn_pcg_local(graph: FactorGraph, values: VariableArena, damping,
                  pcg_iters: int):
    """Matrix-free sharded GN step (runs inside shard_map).

    ``graph`` holds this device's factor shard; ``values`` is replicated.
    Per-factor J^T J blocks are precomputed once per linearization; the CG
    loop's Hessian-vector product is one batched (td,td) matvec + scatter
    per factor type followed by a single psum of the (D,) result. Damping
    and the unused-slot identity are added AFTER the psum so the global
    system matches the single-device solver exactly.
    """
    blocks = linearize_blocks(graph, values)
    mask = used_slot_mask(values)
    D = mask.shape[0]
    dt = mask.dtype

    g = jnp.zeros(D, dt)
    for r, J, cols in blocks:
        g = g.at[cols].add(jnp.einsum("fei,fe->fi", J, r))
    g = jax.lax.psum(g, AXIS)

    pre = [(jnp.einsum("fei,fej->fij", J, J), cols) for r, J, cols in blocks]

    # 3x3-aligned block-Jacobi preconditioner (all variable tangents are
    # multiples of 3 wide at 3-aligned offsets): local contributions, one
    # (D/3, 3, 3) psum, then the global damping/identity terms
    nblk = D // 3
    Bd = jnp.zeros((nblk, 3, 3), dt)
    for JtJ, cols in pre:
        td = cols.shape[1]
        for p0 in range(0, td, 3):
            bid = cols[:, p0] // 3
            Bd = Bd.at[bid].add(JtJ[:, p0:p0 + 3, p0:p0 + 3])
    Bd = jax.lax.psum(Bd, AXIS)
    eye3 = jnp.eye(3, dtype=dt)
    base = damping * jnp.ones_like(mask) + (1.0 - mask)
    Bd = Bd + base.reshape(nblk, 3)[:, :, None] * eye3
    Minv = inv33(Bd)

    def hvp(v):
        out = jnp.zeros(D, dt)
        for JtJ, cols in pre:
            out = out.at[cols].add(jnp.einsum("fij,fj->fi", JtJ, v[cols]))
        out = jax.lax.psum(out, AXIS)       # ONE (D,) all-reduce per CG iter
        return out + damping * v + (1.0 - mask) * v

    def apply_precond(r):
        return jnp.einsum("bij,bj->bi", Minv,
                          r.reshape(nblk, 3)).reshape(-1)

    delta = solve_pcg_precond(hvp, g, apply_precond, pcg_iters)
    return retract_all(values, delta)


def sharded_gn_step(mesh: Mesh):
    """Build a jitted one-iteration dense-H GN step over the mesh.

    Factor tables sharded on their leading axis (capacities must divide the
    mesh size — see ``pad_graph_for_mesh``); values replicated. The psum
    moves the full (D, D) Hessian: use only for small graphs, and
    ``sharded_gn_pcg_step`` at scale.
    """
    fn = shard_map(
        _gn_local,
        mesh=mesh,
        in_specs=(P(AXIS), P(), P()),
        out_specs=P(),
    )
    return jax.jit(fn)


def sharded_gn_pcg_step(mesh: Mesh, pcg_iters: int = 100):
    """Build a jitted matrix-free sharded GN step (O(D) collectives)."""
    fn = shard_map(
        functools.partial(_gn_pcg_local, pcg_iters=pcg_iters),
        mesh=mesh,
        in_specs=(P(AXIS), P(), P()),
        out_specs=P(),
    )
    return jax.jit(fn)


def sharded_gn(mesh: Mesh, graph: FactorGraph, values: VariableArena,
               iterations: int = 8, damping: float = 0.0,
               solver: str = "pcg", pcg_iters: int = 100):
    """Run ``iterations`` sharded GN steps; returns (values, final_error).

    The PCG path fuses ALL iterations into one device program (a
    ``lax.scan`` inside the ``shard_map``): on remote-attached devices
    each dispatch costs ~180 ms regardless of content, so a 20-iteration
    optimize is one dispatch instead of twenty.
    """
    graph = pad_graph_for_mesh(graph, len(mesh.devices.flat))
    damping = jnp.asarray(damping, values.pose_t.dtype)
    if solver == "pcg":
        def local(graph, values, damping):
            def body(vals, _):
                return _gn_pcg_local(graph, vals, damping,
                                     pcg_iters=pcg_iters), None

            values, _ = jax.lax.scan(body, values, None,
                                     length=iterations)
            return values

        fn = jax.jit(shard_map(local, mesh=mesh,
                               in_specs=(P(AXIS), P(), P()),
                               out_specs=P()))
        values = fn(graph, values, damping)
    else:
        step = sharded_gn_step(mesh)
        for _ in range(iterations):
            values = step(graph, values, damping)
    return values, total_error(graph, values)


# ---------------------------------------------------------------------------
# Sharded bundle adjustment: square-root Schur with landmarks over the mesh
# ---------------------------------------------------------------------------


def _ba_sqrt_local(graph, values, obs_idx, obs_valid, prior_row,
                   prior_valid, q_ids, damping, *, iterations, chunk):
    """Runs inside ``shard_map``: graph/values replicated, landmark tables
    sharded. Per GN step the collectives are ONE (Dp, Dp) psum of the
    landmark-partial reduced camera system (+ its (Dp,) gradient) and one
    (Pq, 3) psum assembling the back-substituted landmark updates —
    independent of the observation count, which is where BA's data lives.
    """
    from ..graph import ba_solve as B
    from ..graph.variables import layout_of as _layout

    lay = _layout(values)
    Pq_total = lay.point_cap

    def step(vals, _):
        (S, g), back = B._landmark_qr_reduce(
            graph, vals, lay, obs_idx, obs_valid, prior_row, prior_valid,
            q_ids, damping, chunk)
        S = jax.lax.psum(S, AXIS)
        g = jax.lax.psum(g, AXIS)
        # non-point terms added ONCE per (replicated) device, after psum
        S, g = B._add_nonpoint_and_base(graph, vals, lay, S, g, damping)
        dp = B._solve_reduced(S, g)
        dq_loc = B._backsub_points(*back, dp)          # (Pq_local, 3)
        # shards own disjoint q_ids; padded rows are live=0 -> zero, so
        # .add is safe even under JAX's clip-to-edge OOB semantics
        dq = jnp.zeros((Pq_total, 3), dp.dtype).at[q_ids].add(dq_loc)
        dq = jax.lax.psum(dq, AXIS).reshape(-1)
        return retract_all(vals, jnp.concatenate([dp, dq])), None

    vals, _ = jax.lax.scan(step, values, None, length=iterations)
    return vals


def sharded_ba_sqrt(mesh: Mesh, graph: FactorGraph, values: VariableArena,
                    iterations: int = 8, damping: float = 1e-6,
                    chunk: int = 2048):
    """Multi-device BA: landmark QR elimination sharded over the mesh.

    The f32-stable square-root Schur (``graph.ba_solve``) data-parallel
    over LANDMARKS: each device eliminates its landmark shard (vmapped
    thin QR + chunked dense reduction on local rows), the reduced camera
    system is one (Dp, Dp) psum, the replicated solve is tiny, and
    back-substitution stays local. Graph tables ride replicated (each
    device gathers arbitrary projection rows of its landmarks); only the
    landmark index tables shard. All ``iterations`` steps fuse into one
    device program. Returns ``(values, final_error)``.
    """
    from ..graph.ba_solve import build_point_obs

    n = len(mesh.devices.flat)
    lay = layout_of(values)
    obs_idx, obs_valid, prior_row, prior_valid = build_point_obs(
        graph, lay.point_cap)
    Pq = obs_idx.shape[0]
    Pq_pad = ((Pq + n - 1) // n) * n
    pad = Pq_pad - Pq
    q_ids = np.arange(Pq_pad, dtype=np.int32)   # padded rows: live=0 guard
    if pad:
        obs_idx = np.pad(obs_idx, ((0, pad), (0, 0)))
        obs_valid = np.pad(obs_valid, ((0, pad), (0, 0)))
        prior_row = np.pad(prior_row, ((0, pad), (0, 0)))
        prior_valid = np.pad(prior_valid, ((0, pad), (0, 0)))

    fn = jax.jit(shard_map(
        functools.partial(_ba_sqrt_local, iterations=int(iterations),
                          chunk=int(chunk)),
        mesh=mesh,
        in_specs=(P(), P(), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS),
                  P()),
        out_specs=P(),
    ))
    damping_j = jnp.asarray(damping, values.pose_t.dtype)
    vals = fn(graph, values, jnp.asarray(obs_idx), jnp.asarray(obs_valid),
              jnp.asarray(prior_row), jnp.asarray(prior_valid),
              jnp.asarray(q_ids), damping_j)
    return vals, total_error(graph, vals)
