"""Pairwise-consistent loop-closure gating (PCM) for pose graphs.

The reference accepts every loop closure that survives its per-edge motion
gates (``isSmallTrafo``/``isLargeTrafo``, gtsam_graph.cpp:1790-1812) — a
single perceptual-aliasing match that happens to look like a plausible
motion still corrupts the whole trajectory. PCM (Mangelson, Dominic,
Eustice, Vasudevan, ICRA 2018) accepts the largest subset of loop closures
that are *jointly* consistent with each other and the odometry: two loops
``a`` and ``b`` are pairwise consistent when the cycle

    e_ab = Log( Z_a · O(j_a→j_b) · Z_b^{-1} · O(i_b→i_a) )

(``Z`` = measured relative pose, ``O`` = odometry-composed relative pose
between the loops' endpoints) has a small Mahalanobis norm, and the
accepted set is a maximum clique of the pairwise-consistency graph.

Each loop must also pass a UNARY odometry-consistency test (the same
statistic with ``b`` replaced by the odometry chain itself) — pairwise
consistency alone cannot break a tie between two disagreeing loops.

TPU-native split: the per-loop odometry distances and the L x L cycle
errors are each ONE vmapped device program over precomputed per-loop
half-transforms (no Python pair loop); the maximum clique — tiny,
combinatorial, and data-dependent — runs on host (greedy conflict
peeling + Bron–Kerbosch with pivoting and an expansion budget).

This complements, not replaces, :mod:`graph.gnc`: PCM removes gross
outliers *before* optimization ever sees them (GNC must survive its convex
stage with the outliers in the cost), while GNC also handles inlier-ish
edges with fat tails. ``loop_gate="pcm"`` + ``robust="gnc-tls"`` composes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import se3
from ..utils.chi2 import chi2_quantile
from .factors import FactorGraph
from .variables import VariableArena

__all__ = ["PcmResult", "pcm_mask", "pairwise_consistency",
           "odometry_consistency", "max_clique"]


class PcmResult(NamedTuple):
    accepted: np.ndarray        # (F,) bool over between rows: keep active
    candidate_rows: np.ndarray  # (L,) int row indices that were gated
    clique_rows: np.ndarray     # (K,) int row indices the clique accepted
    m2_odo: np.ndarray          # (L,) odometry-consistency distances
    m2: np.ndarray              # (L, L) squared Mahalanobis cycle errors
    threshold: float            # chi2 acceptance threshold (both tests)


@jax.jit
def _pairwise_m2(Ri, ti, Rj, tj, ZR, Zt, cov, i_idx, j_idx, odo_cov):
    """(L, L) squared Mahalanobis norms of the loop-pair cycle errors.

    Per-loop half-transforms make each pair two composes + one log: with
    ``P_a = Z_a · X_{j_a}^{-1}``, ``Q_b = X_{j_b} · Z_b^{-1} · X_{i_b}^{-1}``
    and ``W_a = X_{i_a}``,

        e_ab = Log(P_a · Q_b · W_a)

    equals the cycle error in the module docstring (identity when both
    loops agree with the odometry chain between their endpoints). The
    cycle covariance uses the independent-measurement approximation
    ``cov_a + cov_b`` plus an isotropic ``odo_cov`` per node step
    separating the two loops' endpoints.
    """
    Xi = se3.Pose(Ri, ti)
    Xj = se3.Pose(Rj, tj)
    Z = se3.Pose(ZR, Zt)
    P = jax.vmap(lambda z, xj: se3.compose(z, se3.inverse(xj)))(Z, Xj)
    Q = jax.vmap(lambda xj, z, xi: se3.compose(
        xj, se3.compose(se3.inverse(z), se3.inverse(xi))))(Xj, Z, Xi)
    eye6 = jnp.eye(6, dtype=cov.dtype)

    def pair(pa, wa, cov_a, ia, ja, qb, cov_b, ib, jb):
        eps = se3.logmap(se3.compose(pa, se3.compose(qb, wa)))
        sep = (jnp.abs(ia - ib) + jnp.abs(ja - jb)).astype(cov.dtype)
        sigma = cov_a + cov_b + (odo_cov * sep) * eye6
        return eps @ jnp.linalg.solve(sigma, eps)

    def row(pa, wa, cov_a, ia, ja):
        return jax.vmap(
            lambda qb, cov_b, ib, jb: pair(pa, wa, cov_a, ia, ja,
                                           qb, cov_b, ib, jb)
        )(Q, cov, i_idx, j_idx)

    return jax.vmap(row)(P, Xi, cov, i_idx, j_idx)


@jax.jit
def _unary_m2(Ri, ti, Rj, tj, ZR, Zt, cov, i_idx, j_idx, odo_cov):
    """(L,) odometry-consistency distances: Mahalanobis norm of
    ``Log(Z_a^{-1} · X_{i_a}^{-1} X_{j_a})`` under the loop covariance
    plus the drift allowance for the ``|j_a - i_a|``-step odometry path."""
    eye6 = jnp.eye(6, dtype=cov.dtype)

    def one(Ri_a, ti_a, Rj_a, tj_a, zR, zt, cov_a, ia, ja):
        O = se3.between(se3.Pose(Ri_a, ti_a), se3.Pose(Rj_a, tj_a))
        eps = se3.local(se3.Pose(zR, zt), O)
        sep = jnp.abs(ja - ia).astype(cov.dtype)
        sigma = cov_a + (odo_cov * sep) * eye6
        return eps @ jnp.linalg.solve(sigma, eps)

    return jax.vmap(one)(Ri, ti, Rj, tj, ZR, Zt, cov, i_idx, j_idx)


def _loop_arrays(graph: FactorGraph, values: VariableArena, rows):
    """Gather the per-loop device inputs shared by both consistency tests."""
    bt = graph.between
    rows = np.asarray(rows, int)
    i = np.asarray(bt.i)[rows]
    j = np.asarray(bt.j)[rows]
    S = np.asarray(bt.sqrt_info)[rows]
    info = np.einsum("lki,lkj->lij", S, S)       # info = S^T S
    cov = np.linalg.inv(info)
    return (values.pose_R[jnp.asarray(i)], values.pose_t[jnp.asarray(i)],
            values.pose_R[jnp.asarray(j)], values.pose_t[jnp.asarray(j)],
            jnp.asarray(bt.meas_R)[jnp.asarray(rows)],
            jnp.asarray(bt.meas_t)[jnp.asarray(rows)],
            jnp.asarray(cov, values.pose_t.dtype),
            jnp.asarray(i, jnp.int32), jnp.asarray(j, jnp.int32))


def pairwise_consistency(graph: FactorGraph, values: VariableArena,
                         rows: np.ndarray,
                         odo_cov_per_step: float = 0.0) -> np.ndarray:
    """(L, L) squared Mahalanobis cycle errors for the between rows ``rows``.

    ``values`` must hold the odometry-composed estimate (the arena as the
    builder produced it) — PCM measures loops against the *odometry*, not
    against an already-loop-corrected solution.
    """
    args = _loop_arrays(graph, values, rows)
    m2 = _pairwise_m2(*args, jnp.asarray(odo_cov_per_step,
                                         values.pose_t.dtype))
    return np.asarray(m2)


def odometry_consistency(graph: FactorGraph, values: VariableArena,
                         rows: np.ndarray,
                         odo_cov_per_step: float = 0.0) -> np.ndarray:
    """(L,) squared Mahalanobis distances of each loop vs the odometry."""
    args = _loop_arrays(graph, values, rows)
    m2 = _unary_m2(*args, jnp.asarray(odo_cov_per_step,
                                      values.pose_t.dtype))
    return np.asarray(m2)


def _greedy_clique(adj: np.ndarray) -> list[int]:
    """Large clique fast: peel the vertex with the most conflicts until
    none remain.

    PCM consistency graphs are near-complete (inliers agree with almost
    everything), so the COMPLEMENT is sparse and clique-finding is really
    conflict-cover removal — the regime where Bron–Kerbosch alone
    struggles (near-complete graphs maximize its branching).
    """
    n = adj.shape[0]
    conflicts = ~adj
    np.fill_diagonal(conflicts, False)
    alive = np.ones(n, bool)
    while True:
        deg = (conflicts & alive[None, :]).sum(1)
        deg[~alive] = 0
        worst = int(deg.argmax())
        if deg[worst] == 0:
            break
        alive[worst] = False
    return np.flatnonzero(alive).tolist()


def max_clique(adj: np.ndarray, budget: int = 200_000) -> list[int]:
    """Maximum clique of a symmetric boolean adjacency matrix.

    A greedy conflict-peeling warm start (near-optimal on the
    near-complete graphs PCM produces) seeds Bron–Kerbosch with pivoting;
    ``budget`` caps the number of branch expansions — past it the best
    clique found so far is returned (still a valid consistent set,
    possibly sub-maximum).
    """
    import sys

    n = adj.shape[0]
    if n == 0:
        return []
    nbrs = [set(np.flatnonzero(adj[k]).tolist()) - {k} for k in range(n)]
    best: list[int] = _greedy_clique(adj)
    spent = 0
    # recursion depth is bounded by the deepest descent (≤ n on
    # near-complete graphs); keep headroom beyond Python's default 1000
    limit = sys.getrecursionlimit()
    if n + 100 > limit:
        sys.setrecursionlimit(n + 1000)

    def bk(R: list[int], P: set, X: set) -> None:
        nonlocal best, spent
        if spent > budget:
            return
        if not P and not X:
            if len(R) > len(best):
                best = R[:]
            return
        if len(R) + len(P) <= len(best):
            return
        pivot = max(P | X, key=lambda u: len(P & nbrs[u]))
        for v in list(P - nbrs[pivot]):
            spent += 1
            bk(R + [v], P & nbrs[v], X & nbrs[v])
            P.remove(v)
            X.add(v)

    bk([], set(range(n)), set())
    return sorted(best)


def pcm_mask(graph: FactorGraph, values: VariableArena,
             candidates=None, alpha: float = 1e-4,
             odo_cov_per_step: float | None = None,
             budget: int = 200_000) -> PcmResult:
    """Gate loop closures by pairwise consistency maximization.

    ``candidates``: (F,) bool over between rows — which edges are loop
    closures subject to gating (default: every active row whose endpoints
    are not consecutive graph ids, the same heuristic the GNC path uses).
    ``alpha``: upper-tail probability of the chi2(6) acceptance test,
    the reference's gating-statistic family (gtsam/chi2.h:17-26). The
    default is deliberately far out in the tail (1e-4 ⇒ the 0.9999
    quantile): the test runs on all L² loop PAIRS, so a per-pair tail of
    1% would falsely conflict every inlier with ~1% of the others; gross
    outliers sit orders of magnitude past any of these quantiles.
    ``odo_cov_per_step``: isotropic covariance added per node step
    separating two loops' endpoints — the drift allowance for the
    odometry segments inside each cycle. Default (None) derives it from
    the odometry edges themselves (mean diagonal covariance of the
    consecutive-id between rows), so the gate self-tunes to the log's
    own noise level; pass 0.0 to trust the odometry exactly.

    Returns a full-length ``accepted`` mask: non-candidate rows stay True;
    candidate rows are True iff they belong to the maximum clique of the
    pairwise-consistency graph. Apply with
    ``graph._replace(between=bt._replace(active=bt.active & accepted))``.
    """
    bt = graph.between
    active = np.asarray(bt.active, bool)
    if candidates is None:
        candidates = (np.asarray(bt.j) - np.asarray(bt.i)) != 1
    cand = np.asarray(candidates, bool) & active
    if odo_cov_per_step is None:
        odo = active & ~np.asarray(candidates, bool)
        if odo.any():
            S = np.asarray(bt.sqrt_info)[odo]
            info = np.einsum("lki,lkj->lij", S, S)
            diag_cov = np.diagonal(np.linalg.inv(info), axis1=1, axis2=2)
            odo_cov_per_step = float(diag_cov.mean())
        else:
            odo_cov_per_step = 0.0
    rows = np.flatnonzero(cand)
    accepted = np.ones(active.shape, bool)
    thresh = chi2_quantile(6, alpha)
    if len(rows) == 0:
        z = np.zeros(0)
        return PcmResult(accepted, rows, rows, z, z.reshape(0, 0), thresh)
    # unary odometry-consistency check first (the Kimera-RPGO ordering):
    # pairwise consistency alone cannot break a tie between disagreeing
    # loops — with one true and one wild loop both singleton cliques have
    # size 1 and the outlier can win. A loop must first be consistent
    # with the odometry chain between its own endpoints.
    m2_odo = odometry_consistency(graph, values, rows,
                                  odo_cov_per_step=odo_cov_per_step)
    ok = m2_odo <= thresh
    accepted[rows[~ok]] = False
    if ok.sum() <= 1:
        m2 = np.zeros((len(rows), len(rows)))
        return PcmResult(accepted, rows, rows[ok], m2_odo, m2, thresh)
    m2 = pairwise_consistency(graph, values, rows,
                              odo_cov_per_step=odo_cov_per_step)
    m2 = np.maximum(m2, m2.T)      # symmetrize: consistency is mutual
    adj = (m2 <= thresh) & ok[None, :] & ok[:, None]
    sub = np.flatnonzero(ok)
    clique = max_clique(adj[np.ix_(sub, sub)], budget=budget)
    keep = np.zeros(len(rows), bool)
    keep[sub[clique]] = True
    accepted[rows[~keep]] = False
    return PcmResult(accepted, rows, rows[keep], m2_odo, m2, thresh)
