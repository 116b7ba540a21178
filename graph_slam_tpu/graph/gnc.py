"""Graduated non-convexity (GNC) for outlier-robust pose-graph optimization.

The reference's only defenses against bad loop closures are the motion
gates and the (default-off) chi2 VRO gate (gtsam_graph.cpp:1790-1812,
test_vro_imu_graph.cpp:677-782) — a single surviving wrong edge corrupts
the whole trajectory. GTSAM's modern answer is ``GncOptimizer`` (Yang,
Antonante, Tzoumas, Carlone, RA-L 2020): alternate between a weighted
Gauss-Newton solve and a closed-form per-edge weight update, annealing a
convexity parameter mu so the robust cost starts convex and sharpens into
truncated least squares (TLS) or Geman-McClure (GM).

This is the TPU-native equivalent: the whole anneal — every weight
update, every re-weighted linearization, every GN solve — is ONE jitted
program (``lax.fori_loop`` over the mu schedule around the existing
``gn_optimize`` scan). Weights scale the between rows' sqrt-information,
so no new factor machinery is needed and the padded-arena shapes never
change.

Edge weights land in the result: rejected edges finish at w ~ 0, inliers
at w ~ 1 — the same signal the reference writes to its rejected-edge log
(test_vro_imu_graph.cpp:755-762), but decided jointly by the optimizer
instead of by a per-edge gate.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.chi2 import chi2_quantile
from .factors import FactorGraph, _between_res, total_error
from .lm import gn_optimize
from .variables import VariableArena

__all__ = ["GncResult", "gnc_optimize"]


class GncResult(NamedTuple):
    values: VariableArena
    error: jnp.ndarray        # chi2 with the converged weights applied
    #                           (rejected edges contribute 0 — the robust
    #                           cost; equals plain chi2 when all-inlier)
    error_raw: jnp.ndarray    # chi2 of the UNWEIGHTED graph at the solution
    weights: jnp.ndarray      # (F,) final per-between-edge weights in [0, 1]
    inliers: jnp.ndarray      # (F,) bool, weights > 0.5 on candidate rows
    mu: jnp.ndarray           # final convexity parameter


def _between_r2(graph: FactorGraph, values: VariableArena):
    """Squared whitened residual norm per between row (masked to 0 when
    inactive)."""
    bt = graph.between
    dt = values.pose_t.dtype

    def one(row):
        e = _between_res(values, row, jnp.zeros(12, dt))
        r = row.sqrt_info @ e
        return jnp.sum(r * r)

    r2 = jax.vmap(one)(bt)
    return jnp.where(bt.active, r2, 0.0)


def _tls_weights(r2, mu, barc2):
    hi = (mu + 1.0) / mu * barc2
    lo = mu / (mu + 1.0) * barc2
    mid = jnp.sqrt(barc2 * mu * (mu + 1.0) / jnp.maximum(r2, 1e-30)) - mu
    w = jnp.where(r2 >= hi, 0.0, jnp.where(r2 <= lo, 1.0,
                                           jnp.clip(mid, 0.0, 1.0)))
    return w


def _gm_weights(r2, mu, barc2):
    w = (mu * barc2 / (r2 + mu * barc2)) ** 2
    return jnp.clip(w, 0.0, 1.0)


def _scaled(graph: FactorGraph, w):
    bt = graph.between
    sw = jnp.sqrt(w).astype(bt.sqrt_info.dtype)
    return graph._replace(
        between=bt._replace(sqrt_info=bt.sqrt_info * sw[:, None, None]))


@functools.partial(
    jax.jit,
    static_argnames=("kind", "outer_iters", "gn_iters", "solver",
                     "pcg_iters", "damping"))
def _gnc_run(graph, values, candidates, barc2, kind: str, outer_iters: int,
             gn_iters: int, solver: str, pcg_iters: int, damping: float,
             mu_factor):
    dt = values.pose_t.dtype
    tls = kind == "tls"
    weight_fn = _tls_weights if tls else _gm_weights
    cand = candidates & graph.between.active

    r2_0 = _between_r2(graph, values)
    r2_max = jnp.max(jnp.where(cand, r2_0, 0.0))
    # convex-start mu (Yang et al. §III-B). The paper anneals until a
    # stopping criterion; this is a fixed-trip jitted loop, so mu0 is
    # clamped to >= 1e-2 — with wild outliers the exact formula starts so
    # small (r2_max ~ 1e6 => mu0 ~ 1e-6) that no practical number of x1.4
    # steps reaches the TLS threshold regime.
    if tls:
        mu0 = jnp.clip(barc2 / (2.0 * r2_max - barc2), 1e-2, 1e2)
    else:
        mu0 = jnp.clip(2.0 * r2_max / barc2, 1.0, 1e6)

    def body(_, state):
        vals, mu = state
        r2 = _between_r2(graph, vals)
        w = jnp.where(cand, weight_fn(r2, mu, barc2), 1.0)
        res = gn_optimize(_scaled(graph, w), vals, iterations=gn_iters,
                          solver=solver, damping=damping,
                          pcg_iters=pcg_iters)
        mu = mu * mu_factor if tls else jnp.maximum(mu / mu_factor, 1.0)
        return res.values, mu

    vals, mu = jax.lax.fori_loop(
        0, outer_iters, body, (values, jnp.asarray(mu0, dt)))

    r2 = _between_r2(graph, vals)
    w = jnp.where(cand, weight_fn(r2, mu, barc2), 1.0)
    return (vals, total_error(_scaled(graph, w), vals),
            total_error(graph, vals), w, (w > 0.5) | ~cand, mu)


def gnc_optimize(graph: FactorGraph, values: VariableArena,
                 candidates=None, kind: str = "tls",
                 barc2: float | None = None, outer_iters: int = 25,
                 gn_iters: int = 3, solver: str = "dense",
                 pcg_iters: int = 50, damping: float = 1e-6,
                 mu_factor: float = 1.4) -> GncResult:
    """Outlier-robust optimization of the between edges by GNC.

    ``candidates``: (F,) bool over between rows — which edges may be
    down-weighted (default: all active rows). Odometry chains that should
    stay trusted are excluded by passing a loop-closure-only mask.
    ``barc2``: max squared whitened residual for an inlier; defaults to
    the chi2(6) 0.99 quantile — the reference's gating statistic family
    (utils/chi2, gtsam/chi2.h:17-26).
    ``kind``: "tls" (truncated least squares — hard rejection) or "gm"
    (Geman-McClure — smooth down-weighting).
    """
    if kind not in ("tls", "gm"):
        raise ValueError(f"unknown GNC kind {kind!r} (tls|gm)")
    bt = graph.between
    if candidates is None:
        candidates = jnp.ones(bt.active.shape, bool)
    dt = values.pose_t.dtype
    if barc2 is None:
        barc2 = chi2_quantile(6, 0.01)
    vals, err, err_raw, w, inl, mu = _gnc_run(
        graph, values, jnp.asarray(candidates, bool),
        jnp.asarray(barc2, dt), kind, outer_iters, gn_iters, solver,
        pcg_iters, float(damping), jnp.asarray(mu_factor, dt))
    return GncResult(vals, err, err_raw, w, inl, mu)
