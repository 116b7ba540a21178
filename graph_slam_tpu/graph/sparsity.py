"""Static sparsity structure: degree-padded incidence gathers.

TPU scatters (``.at[].add`` with data-dependent indices) serialize badly;
gathers are fast. Since the factor graph's sparsity pattern is *static per
graph shape* (SURVEY.md §7), we precompute, on the host, for every global
tangent slot the (padded) list of per-factor contribution positions that
accumulate into it. The matrix-free products in the CG inner loop then
become pure gather+sum — no scatter at all:

    J^T x : contrib[f, c] computed batched -> y[d] = sum_k contrib_flat[inc[d, k]]

The same incidence serves the gradient, the Hessian-vector product, and the
Jacobi preconditioner diagonal. One extra zero row at the end of the flat
contribution buffer absorbs padding.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from .factors import FactorGraph
from .variables import VariableArena, layout_of

__all__ = ["Incidence", "build_incidence", "gather_sum"]


class Incidence(NamedTuple):
    """(D, K) gather indices into the flat per-(factor, column) buffer."""

    idx: jnp.ndarray      # int32 (D, K); pad entries point at the zero row
    n_flat: int           # static: total flat contributions (pad row = n_flat)

    @property
    def dim(self) -> int:
        return self.idx.shape[0]


def _np_cols(graph: FactorGraph, values: VariableArena):
    """Host-side replica of ``linearize_blocks`` column layout (numpy)."""
    lay = layout_of(values)

    def pose_cols(idx):
        return lay.pose_off + 6 * idx[:, None] + np.arange(6)

    def vel_cols(idx):
        return lay.vel_off + 3 * idx[:, None] + np.arange(3)

    def bias_cols(idx):
        return lay.bias_off + 6 * idx[:, None] + np.arange(6)

    def plane_cols(idx):
        return lay.plane_off + 3 * idx[:, None] + np.arange(3)

    def point_cols(idx):
        return lay.point_off + 3 * idx[:, None] + np.arange(3)

    cols = []   # (F, td) global column ids per table
    actives = []  # (F,) bool per table
    g = graph
    if g.prior_pose.idx.shape[0]:
        cols.append(pose_cols(np.asarray(g.prior_pose.idx)))
        actives.append(np.asarray(g.prior_pose.active))
    if g.between.i.shape[0]:
        cols.append(np.concatenate(
            [pose_cols(np.asarray(g.between.i)),
             pose_cols(np.asarray(g.between.j))], axis=1))
        actives.append(np.asarray(g.between.active))
    if g.prior_vel.idx.shape[0]:
        cols.append(vel_cols(np.asarray(g.prior_vel.idx)))
        actives.append(np.asarray(g.prior_vel.active))
    if g.prior_bias.idx.shape[0]:
        cols.append(bias_cols(np.asarray(g.prior_bias.idx)))
        actives.append(np.asarray(g.prior_bias.active))
    if g.plane.pose_idx.shape[0]:
        cols.append(np.concatenate(
            [pose_cols(np.asarray(g.plane.pose_idx)),
             plane_cols(np.asarray(g.plane.plane_idx))], axis=1))
        actives.append(np.asarray(g.plane.active))
    if g.imu.i.shape[0]:
        cols.append(np.concatenate(
            [pose_cols(np.asarray(g.imu.i)), vel_cols(np.asarray(g.imu.i)),
             bias_cols(np.asarray(g.imu.i)),
             pose_cols(np.asarray(g.imu.j)), vel_cols(np.asarray(g.imu.j)),
             bias_cols(np.asarray(g.imu.j))], axis=1))
        actives.append(np.asarray(g.imu.active))
    if g.projection.pose_idx.shape[0]:
        cols.append(np.concatenate(
            [pose_cols(np.asarray(g.projection.pose_idx)),
             point_cols(np.asarray(g.projection.point_idx))], axis=1))
        actives.append(np.asarray(g.projection.active))
    if g.prior_point.idx.shape[0]:
        cols.append(point_cols(np.asarray(g.prior_point.idx)))
        actives.append(np.asarray(g.prior_point.active))
    return cols, actives, lay.dim


def build_incidence(graph: FactorGraph, values: VariableArena,
                    pad_to_multiple: int = 1) -> Incidence:
    """Host-side construction of the slot -> contributions gather table.

    Must be called with the same (padded) graph the optimizer will see.
    Only *active* rows enter the gather lists (padded rows contribute exact
    zeros and would otherwise pile hundreds of useless entries onto variable
    slot 0, exploding the pad width K). Rebuild after activating new rows
    (host-side, milliseconds).
    """
    cols_list, active_list, dim = _np_cols(graph, values)
    flats = []
    offset = 0
    for c, a in zip(cols_list, active_list):
        F, td = c.shape
        flat_idx = offset + np.arange(F * td)
        slots = c.reshape(-1)
        live = np.repeat(a, td)
        flats.append(np.stack([slots[live], flat_idx[live]]))
        offset += F * td
    if flats:
        slots_live = np.concatenate([f[0] for f in flats])
        flatidx_live = np.concatenate([f[1] for f in flats])
    else:
        slots_live = np.zeros(0, np.int64)
        flatidx_live = np.zeros(0, np.int64)
    n_flat = offset

    order = np.argsort(slots_live, kind="stable")
    sorted_slots = slots_live[order]
    order = flatidx_live[order]
    counts = np.bincount(sorted_slots, minlength=dim)
    K = int(counts.max()) if n_flat else 1
    K = max(K, 1)
    if pad_to_multiple > 1:
        K = ((K + pad_to_multiple - 1) // pad_to_multiple) * pad_to_multiple

    idx = np.full((dim, K), n_flat, dtype=np.int64)  # pad -> zero row
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    # vectorized fill: position of each sorted element within its slot run
    n_live = sorted_slots.shape[0]
    pos_in_run = np.arange(n_live) - np.repeat(starts, counts)
    idx[sorted_slots, pos_in_run] = order
    return Incidence(idx=jnp.asarray(idx, jnp.int32), n_flat=n_flat)


def gather_sum(inc: Incidence, contrib_flat):
    """Accumulate flat contributions into the global tangent vector."""
    padded = jnp.concatenate(
        [contrib_flat, jnp.zeros((1,), contrib_flat.dtype)]
    )
    return jnp.sum(padded[inc.idx], axis=1)


def hvp_fn_gather(blocks, inc: Incidence, mask, lam):
    """(H + lam I) v with gather-only accumulation (no scatter)."""

    def hvp(v):
        parts = []
        for r, J, cols in blocks:
            vb = v[cols]                             # gather (F, td)
            Jv = jnp.einsum("fei,fi->fe", J, vb)
            parts.append(jnp.einsum("fei,fe->fi", J, Jv).reshape(-1))
        contrib = jnp.concatenate(parts) if parts else jnp.zeros(
            (0,), v.dtype)
        return gather_sum(inc, contrib) + lam * v + (1.0 - mask) * v

    return hvp


def gradient_gather(blocks, inc: Incidence, dtype):
    """g = J^T r via the incidence gather."""
    parts = []
    for r, J, cols in blocks:
        parts.append(jnp.einsum("fei,fe->fi", J, r).reshape(-1))
    contrib = jnp.concatenate(parts) if parts else jnp.zeros((0,), dtype)
    return gather_sum(inc, contrib)


def diag_gather(blocks, inc: Incidence, mask, lam):
    """Jacobi preconditioner diagonal via the incidence gather."""
    parts = []
    for r, J, cols in blocks:
        parts.append(jnp.einsum("fei,fei->fi", J, J).reshape(-1))
    contrib = jnp.concatenate(parts) if parts else jnp.zeros(
        (0,), mask.dtype)
    return gather_sum(inc, contrib) + lam * jnp.ones_like(mask) + (1.0 - mask)
