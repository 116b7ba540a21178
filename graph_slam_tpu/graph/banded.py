"""Block-banded Hessian CG: scatter-free inner loop for local pose graphs.

TPU scatter-adds with colliding indices serialize (XLA lowers them as a
sequential combiner loop), so the per-CG-iteration ``out.at[cols].add``
of the generic PCG path is latency-bound rather than bandwidth-bound. But
SLAM pose graphs are *band-limited*: odometry links neighbors and loop
closures span at most the lookback window (the reference's
``m_lookback_nodes`` <= 7; sphere2500's synthetic loops span < 50). Within
a half-bandwidth ``W`` blocks, the Hessian is block-banded and the
Hessian-vector product becomes

    out[p] = sum_w  Hband[p, w] @ v[p + w - W]

— an im2col patch extraction (``conv_general_dilated_patches``, a
TPU-native data movement) followed by ONE batched (6, 6(2W+1)) x (6(2W+1))
matvec on the MXU. Scatter happens once per *linearization* (band
assembly), never in the CG loop.

Scope: pose-only graphs (between + prior_pose factors). ``band_halfwidth``
reports the graph's actual span so callers can pick ``W`` statically;
spans beyond ``W`` make ``assemble_band`` raise (fall back to the generic
PCG).

Measured (TPU v5e, sphere2500, 2026-08-16): 45.6 GN it/s vs 263 it/s for
the fused scatter-add PCG — the (P, 2W+1, 6, 6) batched matvec pads each
tiny 6x6 block to an MXU tile, swamping the scatter savings. Kept as a
correct, tested alternative (``bench.py --single banded``); the scatter
path remains the default. A future Pallas kernel owning the band layout
in VMEM is the path to making this formulation win.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .factors import FactorGraph, linearize_blocks, total_error
from .solve import solve_pcg_precond
from .variables import VariableArena, layout_of, retract_all, used_slot_mask

__all__ = ["band_halfwidth", "banded_gn_optimize"]


def band_halfwidth(graph: FactorGraph) -> int:
    """Max |j - i| over active between factors (host-side, for static W)."""
    bt = graph.between
    act = np.asarray(bt.active)
    if not act.any():
        return 0
    i = np.asarray(bt.i)[act]
    j = np.asarray(bt.j)[act]
    return int(np.abs(j - i).max())


def _assemble_band(graph: FactorGraph, values: VariableArena, W: int):
    """(Hband (P, 2W+1, 6, 6), g (D,)) from one linearization.

    Only between + prior_pose tables contribute (pose-only scope); the
    band index of a factor (i, j) block H_ij is ``j - i + W``.
    """
    lay = layout_of(values)
    P = lay.pose_cap
    D = lay.dim
    dt = values.pose_t.dtype
    Wfull = 2 * W + 1

    Hband = jnp.zeros((P, Wfull, 6, 6), dt)
    g = jnp.zeros(D, dt)

    for r, J, cols in linearize_blocks(graph, values):
        g = g.at[cols].add(jnp.einsum("fei,fe->fi", J, r))
        JtJ = jnp.einsum("fei,fej->fij", J, J)
        bi = cols[:, 0] // 6
        if cols.shape[1] == 6:            # prior: diagonal block only
            Hband = Hband.at[bi, W].add(JtJ)
        elif cols.shape[1] == 12:         # between: (i,i) (i,j) (j,i) (j,j)
            bj = cols[:, 6] // 6
            off = bj - bi
            Hband = Hband.at[bi, W].add(JtJ[:, :6, :6])
            Hband = Hband.at[bj, W].add(JtJ[:, 6:, 6:])
            Hband = Hband.at[bi, W + off].add(JtJ[:, :6, 6:])
            Hband = Hband.at[bj, W - off].add(JtJ[:, 6:, :6])
        else:                              # non-pose factor: out of scope
            raise NotImplementedError(
                "banded solver supports pose-only graphs")
    return Hband, g


def _band_matvec_fn(Hband, mask, lam, W: int):
    """v -> (H + lam I) v with zero scatters.

    The sliding windows are built from 2W+1 static contiguous slices of the
    padded block sequence (pure data movement, fully fusible) and the
    product is one batched matvec over (P, 2W+1, 6, 6). A
    ``conv_general_dilated_patches`` formulation lowered to an actual
    convolution on TPU and measured ~6x slower than the scatter PCG; the
    slice-stack keeps the window build bandwidth-bound.
    """
    P = Hband.shape[0]
    Wfull = 2 * W + 1

    def matvec(v):
        vb = v.reshape(P, 6)
        vp = jnp.pad(vb, ((W, W), (0, 0)))          # (P + 2W, 6)
        V = jnp.stack(
            [jax.lax.dynamic_slice_in_dim(vp, w, P, 0)
             for w in range(Wfull)], axis=1)         # (P, Wfull, 6)
        out = jnp.einsum("pwij,pwj->pi", Hband, V).reshape(-1)
        return out + lam * v + (1.0 - mask) * v

    return matvec


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "band_w", "damping", "pcg_iters"),
)
def banded_gn_optimize(graph: FactorGraph, values: VariableArena,
                       iterations: int = 10, band_w: int = 64,
                       damping: float = 0.0, pcg_iters: int = 10):
    """Gauss-Newton with the block-banded scatter-free CG inner loop.

    ``band_w`` must be >= ``band_halfwidth(graph)`` (checked host-side by
    callers; blocks beyond the band would silently drop).
    """
    dt = values.pose_t.dtype

    def body(vals, _):
        mask = used_slot_mask(vals)
        Hband, g = _assemble_band(graph, vals, band_w)

        # 6x6 block-Jacobi preconditioner straight from the band diagonal
        Bd = Hband[:, band_w] + (
            damping * mask + (1.0 - mask)).reshape(-1, 6)[:, :, None] \
            * jnp.eye(6, dtype=dt)
        Minv = jnp.linalg.inv(Bd)

        def precond(r):
            return jnp.einsum("pij,pj->pi", Minv,
                              r.reshape(-1, 6)).reshape(-1)

        matvec = _band_matvec_fn(Hband, mask, jnp.asarray(damping, dt),
                                 band_w)
        delta = solve_pcg_precond(matvec, g, precond, pcg_iters)
        return retract_all(vals, delta), None

    values, _ = jax.lax.scan(body, values, None, length=iterations)
    err = total_error(graph, values)
    return values, err
