"""Batch optimizers: Levenberg–Marquardt (GTSAM-matching) and Gauss–Newton.

``lm_optimize`` reproduces GTSAM 4.0 ``LevenbergMarquardtOptimizer`` default
semantics — the reference's batch path ``CGraphGT::optimizeGraphBatch``
(gtsam_graph.cpp:1784-1788) and g2o's 20-iteration LM
(g2o/g2o_graph.cpp:241-252):

- damping ``H + lam I`` on the whitened system (diagonalDamping=false),
- lambdaInitial 1e-5, fixed lambda factor 10, upper bound 1e5,
- step acceptance by model fidelity > 1e-3
  (actual cost change / linearized cost change),
- convergence when relative decrease <= 1e-5 OR absolute decrease <= 1e-5,
- at most 100 outer iterations.

Everything runs under ``jit``: outer ``lax.while_loop`` over iterations, an
inner ``lax.while_loop`` over lambda trials that reuses one linearization
per outer iteration (exactly GTSAM's relinearize-once-per-iterate shape).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import solve
from .factors import FactorGraph, linearize_blocks, total_error
from .sparsity import (
    Incidence,
    diag_gather,
    gradient_gather,
    hvp_fn_gather,
)
from .variables import (
    VariableArena,
    layout_of,
    retract_all,
    used_slot_mask,
)

__all__ = ["LMParams", "LMResult", "lm_optimize", "lm_optimize_g2o",
           "gn_optimize"]


@dataclasses.dataclass(frozen=True)
class LMParams:
    lambda_initial: float = 1e-5
    lambda_factor: float = 10.0
    lambda_upper: float = 1e5
    lambda_lower: float = 0.0
    min_model_fidelity: float = 1e-3
    max_iterations: int = 100
    relative_error_tol: float = 1e-5
    absolute_error_tol: float = 1e-5
    error_tol: float = 0.0
    max_trials: int = 12          # lambda spans 1e-5..1e5 in 10 x10 steps
    solver: str = "dense"          # "dense" | "pcg"
    pcg_iters: int = 250
    pcg_tol: float = 1e-10


class LMResult(NamedTuple):
    values: VariableArena
    error: jnp.ndarray
    iterations: jnp.ndarray
    lam: jnp.ndarray
    converged: jnp.ndarray
    history: jnp.ndarray | None = None   # (iters,) chi2 after each GN step


def _dense_hg(blocks, mask):
    """Dense GN normal equations (H, g) from linearized blocks.

    Unused tangent slots are pinned with an identity diagonal so H stays
    nonsingular under arena padding; inactive factor rows contribute zero
    because ``linearize_blocks`` already zeroes them.
    """
    dim = mask.shape[0]
    H = jnp.diag(1.0 - mask)
    g = jnp.zeros(dim, dtype=mask.dtype)
    for r, J, cols in blocks:
        H = H.at[cols[:, :, None], cols[:, None, :]].add(
            jnp.einsum("fei,fej->fij", J, J))
        g = g.at[cols].add(jnp.einsum("fei,fe->fi", J, r))
    return H, g


def _anchored_slot_mask(graph: FactorGraph, values: VariableArena):
    """Boolean (dim,) mask of tangent slots held by a near-rigid pose prior.

    g2o marks its gauge with ``setFixed`` (vertex rows never enter H,
    ``/root/reference/g2o/g2o_graph.cpp:80-94``); this builder pins the
    gauge with a tight prior instead. Any pose carrying sqrt-information
    above ~1e4 (sigma below ~1e-4) plays the fixed-vertex role, wherever
    it sits in the arena — deriving the mask from the prior table instead
    of assuming pose 0 keeps ``lambda0 = tau * max_i H_ii`` sane for
    graphs anchored elsewhere.
    """
    lay = layout_of(values)
    anchored = jnp.zeros(lay.dim, bool)
    pp = graph.prior_pose
    if pp.idx.shape[0]:
        tight = pp.active & (
            jax.vmap(jnp.diagonal)(pp.sqrt_info).max(axis=1) > 1e4)
        cols = lay.pose_cols(pp.idx)
        anchored = anchored.at[cols].max(
            jnp.broadcast_to(tight[:, None], cols.shape))
    return anchored


def _solvers(blocks, mask, params: LMParams, inc: Incidence | None = None):
    """Return (solve(lam) -> delta, hmul(delta) -> H delta, g).

    With an ``Incidence`` the PCG path accumulates by gather only (fast on
    TPU); otherwise scatter-add is used.
    """
    if inc is not None and params.solver == "pcg":
        g = gradient_gather(blocks, inc, mask.dtype)

        def solve_fn(lam):
            hvp = hvp_fn_gather(blocks, inc, mask, lam)
            M = diag_gather(blocks, inc, mask, lam)
            return solve.solve_pcg(hvp, g, M, params.pcg_iters,
                                   params.pcg_tol)

        hvp0 = hvp_fn_gather(blocks, inc, mask, 0.0)

        def hmul(v):
            return hvp0(v)

        return solve_fn, hmul, g

    if params.solver == "dense":
        H, g = _dense_hg(blocks, mask)

        def solve_fn(lam):
            return solve.solve_dense(H, g, lam)

        def hmul(v):
            return H @ v

        return solve_fn, hmul, g

    g = jnp.zeros(mask.shape[0], dtype=mask.dtype)
    for r, J, cols in blocks:
        g = g.at[cols].add(jnp.einsum("fei,fe->fi", J, r))

    if params.solver == "pcg":
        # fused path: per-factor J^T J blocks computed once per
        # linearization; each CG iteration is then one batched (td,td)
        # matvec + scatter-add (measured ~7x faster than the two-einsum
        # form on TPU v5e for sphere2500)
        pre = [(jnp.einsum("fei,fej->fij", J, J), cols)
               for r, J, cols in blocks]

        # 3x3-aligned block-Jacobi preconditioner: every variable tangent in
        # the layout is a multiple of 3 wide at a 3-aligned offset, so the
        # aligned 3x3 diagonal blocks of H capture the omega/v blocks of
        # each pose and the full point/plane/vel blocks — far stronger than
        # the scalar diagonal for SE(3) and BA conditioning.
        D = mask.shape[0]
        nblk = D // 3

        def blkdiag_with(lam):
            base = lam * jnp.ones_like(mask) + (1.0 - mask)
            Bd = jnp.zeros((nblk, 3, 3), mask.dtype)
            eye3 = jnp.eye(3, dtype=mask.dtype)
            Bd = Bd + base.reshape(nblk, 3)[:, :, None] * eye3
            for JtJ, cols in pre:
                td = cols.shape[1]
                for p0 in range(0, td, 3):
                    bid = cols[:, p0] // 3
                    Bd = Bd.at[bid].add(JtJ[:, p0:p0 + 3, p0:p0 + 3])
            return Bd

        def hvp_with(lam):
            def hvp(v):
                out = lam * v + (1.0 - mask) * v
                for JtJ, cols in pre:
                    out = out.at[cols].add(
                        jnp.einsum("fij,fj->fi", JtJ, v[cols]))
                return out

            return hvp

        def solve_fn(lam):
            Minv = solve.inv33(blkdiag_with(lam))

            def apply_precond(r):
                return jnp.einsum("bij,bj->bi", Minv,
                                  r.reshape(nblk, 3)).reshape(-1)

            return solve.solve_pcg_precond(hvp_with(lam), g, apply_precond,
                                           params.pcg_iters)

        hvp0 = hvp_with(0.0)

        def hmul(v):
            return hvp0(v)

        return solve_fn, hmul, g

    raise ValueError(f"unknown solver {params.solver!r}")


@functools.partial(jax.jit, static_argnames=("params",))
def lm_optimize(graph: FactorGraph, values: VariableArena,
                params: LMParams = LMParams(),
                inc: Incidence | None = None) -> LMResult:
    dtype = values.pose_t.dtype
    err0 = total_error(graph, values)

    def outer_cond(state):
        values, error, lam, it, done = state
        return (~done) & (it < params.max_iterations)

    def outer_body(state):
        values, error, lam, it, _ = state
        blocks = linearize_blocks(graph, values)
        mask = used_slot_mask(values)
        solve_fn, hmul, g = _solvers(blocks, mask, params, inc)

        def trial_cond(ts):
            lam, trials, accepted, stop, *_ = ts
            return (~accepted) & (~stop) & (trials < params.max_trials)

        def trial_body(ts):
            lam, trials, _, _, best_vals, best_err = ts
            delta = solve_fn(lam)
            new_vals = retract_all(values, delta)
            new_err = total_error(graph, new_vals)
            # linearized cost decrease: -(g . d) - 0.5 d . (H d)
            lin_dec = -jnp.dot(g, delta) - 0.5 * jnp.dot(delta, hmul(delta))
            cost_dec = error - new_err
            fidelity = cost_dec / jnp.where(lin_dec != 0, lin_dec, 1.0)
            ok = (lin_dec > 0) & (fidelity > params.min_model_fidelity)
            ok = ok & jnp.isfinite(new_err)
            lam_next = jnp.where(ok, lam, lam * params.lambda_factor)
            stop = (~ok) & (lam_next > params.lambda_upper)
            best_vals = jax.tree.map(
                lambda a, b: jnp.where(ok, b, a), best_vals, new_vals
            )
            best_err = jnp.where(ok, new_err, best_err)
            return (lam_next, trials + 1, ok, stop, best_vals, best_err)

        ts0 = (lam, jnp.zeros((), jnp.int32), jnp.zeros((), bool),
               jnp.zeros((), bool), values, error)
        lam_out, _, accepted, stuck, new_vals, new_err = jax.lax.while_loop(
            trial_cond, trial_body, ts0
        )

        # on acceptance decrease lambda (GTSAM fixed-factor schedule)
        lam_next = jnp.where(
            accepted,
            jnp.maximum(lam_out / params.lambda_factor, params.lambda_lower),
            lam_out,
        )
        abs_dec = error - new_err
        rel_dec = abs_dec / jnp.where(error > 0, error, 1.0)
        converged = accepted & (
            (new_err <= params.error_tol)
            | (rel_dec <= params.relative_error_tol)
            | (abs_dec <= params.absolute_error_tol)
        )
        done = converged | (~accepted) | stuck
        return (new_vals, new_err, lam_next, it + 1, done)

    state0 = (values, err0, jnp.asarray(params.lambda_initial, dtype),
              jnp.zeros((), jnp.int32), err0 <= params.error_tol)
    values, error, lam, it, done = jax.lax.while_loop(
        outer_cond, outer_body, state0
    )
    return LMResult(values, error, it, lam, done)


@functools.partial(jax.jit,
                   static_argnames=("total_iters", "chunks", "max_trials"))
def lm_optimize_g2o(graph: FactorGraph, values: VariableArena,
                    total_iters: int = 20, chunks: int = 10,
                    tau: float = 1e-5, max_trials: int = 10) -> LMResult:
    """g2o ``CGraphG2O::optimizeGraph`` semantics
    (``/root/reference/g2o/g2o_graph.cpp:241-252``): ``iter=20`` LM
    iterations executed as ``chunks=10`` calls of ``optimize(2)``.

    The chunking is semantic, not cosmetic: g2o's
    ``OptimizationAlgorithmLevenberg`` re-initializes its damping at the
    START OF EVERY ``optimize()`` CALL (``lambda0 = tau * max_i H_ii``,
    tau = 1e-5) and adapts it with the Marquardt–Nielsen schedule inside
    the call (accept: ``lam *= max(1/3, 1-(2*rho-1)^3)``, ni = 2;
    reject: ``lam *= ni``, ``ni *= 2``). The per-chunk lambda RESETS make
    the chi2 trajectory differ from GTSAM's monotone fixed-factor
    schedule (``lm_optimize``) even though both converge to the same
    optimum — exactly the divergence the reference's two backends show.
    Returns ``history``: chi2 after each chunk, (chunks,).
    """
    dtype = values.pose_t.dtype
    err0 = total_error(graph, values)
    iters_per_chunk = -(-total_iters // chunks)   # ceil(iter/10) = 2
    mask = used_slot_mask(values)
    params = LMParams(solver="dense")

    # slots pinned by a near-rigid prior play g2o's fixed-vertex role:
    # their ~1e12 H_ii would inflate lambda0 and stall the Nielsen
    # schedule (see _anchored_slot_mask)
    anchored = _anchored_slot_mask(graph, values)

    def one_iteration(carry, lam_init):
        """One g2o iteration: relinearize, then the trial loop."""
        vals, err, lam, ni = carry
        blocks = linearize_blocks(graph, vals)
        H, g = _dense_hg(blocks, mask)
        # lambda0 = tau * max_i H_ii over the FREE variables only,
        # reproducing the fixed-vertex H of the reference
        diag_free = jnp.where(anchored, 0.0, jnp.diagonal(H))
        lam = jnp.where(lam_init, tau * jnp.max(diag_free), lam)

        def trial_cond(ts):
            lam, ni, trials, accepted, *_ = ts
            return (~accepted) & (trials < max_trials)

        def trial_body(ts):
            lam, ni, trials, _, best_vals, best_err = ts
            delta = solve.solve_dense(H, g, lam)
            new_vals = retract_all(vals, delta)
            new_err = total_error(graph, new_vals)
            # g2o's gain ratio: rho = (F(x) - F(x+d)) / (d^T(lam*d - g))
            denom = jnp.dot(delta, lam * delta - g)
            rho = (err - new_err) / jnp.where(denom != 0, denom, 1.0)
            ok = (rho > 0) & jnp.isfinite(new_err)
            # Nielsen schedule
            scale = jnp.maximum(1.0 / 3.0,
                                1.0 - (2.0 * rho - 1.0) ** 3)
            lam_next = jnp.where(ok, lam * scale, lam * ni)
            ni_next = jnp.where(ok, 2.0, ni * 2.0)
            best_vals = jax.tree.map(
                lambda a, b: jnp.where(ok, b, a), best_vals, new_vals)
            best_err = jnp.where(ok, new_err, best_err)
            return (lam_next, ni_next, trials + 1, ok, best_vals, best_err)

        ts0 = (lam, ni, jnp.zeros((), jnp.int32), jnp.zeros((), bool),
               vals, err)
        lam, ni, _, _, vals, err = jax.lax.while_loop(
            trial_cond, trial_body, ts0)
        return (vals, err, lam, ni), None

    def chunk_body(carry, _):
        vals, err = carry
        # lambda re-initialized on the chunk's first iteration
        inner = (vals, err, jnp.asarray(tau, dtype), jnp.asarray(2.0, dtype))
        for k in range(iters_per_chunk):     # static, tiny (2)
            inner, _ = one_iteration(inner, lam_init=(k == 0))
        vals, err, *_ = inner
        return (vals, err), err

    (values, error), hist = jax.lax.scan(chunk_body, (values, err0), None,
                                         length=chunks)
    return LMResult(values, error, jnp.asarray(total_iters, jnp.int32),
                    jnp.zeros((), dtype), jnp.ones((), bool), hist)


@functools.partial(
    jax.jit,
    static_argnames=("iterations", "solver", "damping", "pcg_iters",
                     "return_history"),
)
def gn_optimize(graph: FactorGraph, values: VariableArena,
                iterations: int = 10, solver: str = "dense",
                damping: float = 0.0, pcg_iters: int = 250,
                inc: Incidence | None = None,
                update_mask=None, return_history: bool = False) -> LMResult:
    """Plain Gauss–Newton with a fixed trip count — the throughput benchmark
    unit ("GN-iteration throughput" target in BASELINE.md).

    ``update_mask`` (optional, (tangent_dim,)) freezes variables: Jacobian
    columns of masked-out slots are zeroed before assembly, so their delta
    solves to exactly 0 and the step is Gauss–Newton on the free subset with
    frozen variables as constants — the fixed-lag boundary of the online
    engine (``graph.online``).
    """
    params = LMParams(solver=solver, pcg_iters=pcg_iters)

    def body(vals, _):
        blocks = linearize_blocks(graph, vals)
        mask = used_slot_mask(vals)
        if update_mask is not None:
            um = update_mask.astype(mask.dtype)
            mask = mask * um
            blocks = [(r, J * um[cols][:, None, :], cols)
                      for r, J, cols in blocks]
        solve_fn, _, _ = _solvers(blocks, mask, params, inc)
        delta = solve_fn(jnp.asarray(damping, vals.pose_t.dtype))
        new_vals = retract_all(vals, delta)
        y = total_error(graph, new_vals) if return_history else None
        return new_vals, y

    values, hist = jax.lax.scan(body, values, None, length=iterations)
    err = hist[-1] if return_history else total_error(graph, values)
    return LMResult(values, err, jnp.asarray(iterations, jnp.int32),
                    jnp.asarray(damping, values.pose_t.dtype),
                    jnp.ones((), bool), hist)
