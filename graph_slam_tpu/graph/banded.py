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
path remains the default.

The MXU-native reformulation is ``banded_direct_gn_optimize``: group S
consecutive poses (S >= W) into SUPERBLOCKS of dimension 6S; the banded
Hessian is then block-TRIDIAGONAL in superblocks, and one GN step is an
EXACT Newton solve by the block Thomas algorithm — a ``lax.scan`` of
dense (6S, 6S) Cholesky factorizations, triangular solves, and matmuls,
every one of them MXU-shaped (S=64 -> 384x384 operands), instead of an
iterative CG over tiny padded blocks. Per GN iteration it does more FLOPs
than PCG-10 but they are dense-matmul FLOPs, and the step is exact, so GN
converges in fewer iterations (``bench.py --single banded_direct``
reports convergence alongside throughput).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .factors import FactorGraph, linearize_blocks, total_error
from .solve import solve_pcg_precond
from .variables import VariableArena, layout_of, retract_all, used_slot_mask

__all__ = ["band_halfwidth", "banded_gn_optimize",
           "banded_direct_gn_optimize"]


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


def _superblock_tridiag(Hband, g, W: int, S: int):
    """Regroup the block band into superblock tridiagonal form.

    ``Hband`` (P, 2W+1, 6, 6) with W <= S -> ``A`` (K, 6S, 6S) diagonal
    superblocks, ``B`` (K-1, 6S, 6S) upper off-diagonals, ``gs`` (K, 6S),
    where K = P / S (caller pads P to a multiple of S). Entry (a, b) of
    superblock (k, k+d) is block H[kS+a, (k+d)S+b] = Hband[kS+a,
    W + dS + b - a], which exists iff |dS + b - a| <= W.
    """
    P = Hband.shape[0]
    K = P // S
    a = jnp.arange(S)[:, None]                    # row block within super
    b = jnp.arange(S)[None, :]                    # col block within super

    def gather(d):
        off = d * S + b - a                       # (S, S) band offsets
        ok = jnp.abs(off) <= W
        w = jnp.clip(off + W, 0, 2 * W)
        p = jnp.arange(K)[:, None, None] * S + a[None]       # (K, S, S)
        blocks = Hband[p, w[None]]                           # (K, S, S, 6, 6)
        blocks = jnp.where(ok[None, :, :, None, None], blocks, 0.0)
        # (K, S, 6, S, 6) -> (K, 6S, 6S)
        return blocks.transpose(0, 1, 3, 2, 4).reshape(K, 6 * S, 6 * S)

    A = gather(0)
    B = gather(1)[:-1]                            # coupling k -> k+1
    gs = g.reshape(K, 6 * S)
    return A, B, gs


def _solve_block_tridiag(A, B, gs):
    """Exact solve of the superblock-tridiagonal system (block Thomas).

    Forward elimination as one ``lax.scan`` of dense Cholesky +
    triangular-solve + matmul steps (each (n, n) with n = 6S — MXU-shaped),
    then a reversed back-substitution scan.

        C_0 = A_0,  y_0 = g_0
        C_k = A_k - B_{k-1}^T C_{k-1}^{-1} B_{k-1}
        y_k = g_k - B_{k-1}^T C_{k-1}^{-1} y_{k-1}
        x_{K-1} = C_{K-1}^{-1} y_{K-1};  x_k = C_k^{-1} (y_k - B_k x_{k+1})
    """
    K, n, _ = A.shape
    dt = A.dtype
    Bp = jnp.concatenate([jnp.zeros((1, n, n), dt), B])   # B_{k-1}, k=0..K-1

    def chol_solve(L, rhs):
        z = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
        return jax.scipy.linalg.solve_triangular(L.T, z, lower=False)

    def fwd(carry, x):
        L_prev, y_prev = carry
        A_k, g_k, B_km1 = x
        CinvB = chol_solve(L_prev, B_km1)                  # C^{-1} B
        Cinvy = chol_solve(L_prev, y_prev)
        C_k = A_k - B_km1.T @ CinvB
        y_k = g_k - B_km1.T @ Cinvy
        L_k = jnp.linalg.cholesky(C_k)
        return (L_k, y_k), (L_k, y_k)

    # k = 0 seeds the carry with an identity "previous" and zero coupling
    carry0 = (jnp.eye(n, dtype=dt), jnp.zeros(n, dt))
    (_, _), (Ls, ys) = jax.lax.scan(fwd, carry0, (A, gs, Bp))

    def bwd(x_next, x):
        L_k, y_k, B_k = x
        x_k = chol_solve(L_k, y_k - B_k @ x_next)
        return x_k, x_k

    Bn = jnp.concatenate([B, jnp.zeros((1, n, n), dt)])    # B_k, k..K-1
    _, xs = jax.lax.scan(bwd, jnp.zeros(n, dt), (Ls, ys, Bn), reverse=True)
    return xs.reshape(-1)


@functools.partial(
    jax.jit, static_argnames=("iterations", "band_w", "super_s", "damping"))
def banded_direct_gn_optimize(graph: FactorGraph, values: VariableArena,
                              iterations: int = 10, band_w: int = 64,
                              super_s: int = 0, damping: float = 0.0):
    """Gauss-Newton with an EXACT banded direct solve per iteration.

    The band is regrouped into superblocks of ``super_s`` poses
    (default max(band_w, 32), must be >= band_w so coupling stays
    tridiagonal) and solved by the block Thomas algorithm — dense
    (6S, 6S) Cholesky/solve/matmul steps on the MXU instead of CG over
    padded 6x6 blocks. Pose-only graphs; requires the pose capacity to
    be treated modulo S (trailing partial superblock is padded through
    the unused-slot mask).
    """
    S = super_s if super_s else max(band_w, 32)
    if S < band_w:
        raise ValueError("super_s must be >= band_w")
    dt = values.pose_t.dtype
    lay = layout_of(values)
    P = lay.pose_cap
    pad_p = (-P) % S

    def body(vals, _):
        mask = used_slot_mask(vals)
        Hband, g = _assemble_band(graph, vals, band_w)
        # damping + unused-slot anchoring on the block diagonal
        diag = (damping * mask + (1.0 - mask)).reshape(-1, 6)
        Hband = Hband.at[:, band_w].add(
            diag[:, :, None] * jnp.eye(6, dtype=dt))
        if pad_p:
            Hband = jnp.pad(Hband, ((0, pad_p), (0, 0), (0, 0), (0, 0)))
            # padded poses: identity diagonal keeps the Cholesky PD
            eye = jnp.broadcast_to(jnp.eye(6, dtype=dt), (pad_p, 6, 6))
            Hband = Hband.at[P:, band_w].set(eye)
            g2 = jnp.concatenate([-g, jnp.zeros(6 * pad_p, dt)])
        else:
            g2 = -g   # GN step: (H + lam I) delta = -g
        A, B, gs = _superblock_tridiag(Hband, g2, band_w, S)
        delta = _solve_block_tridiag(A, B, gs)[:6 * P]
        return retract_all(vals, delta), None

    values, _ = jax.lax.scan(body, values, None, length=iterations)
    err = total_error(graph, values)
    return values, err


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
