"""Marginal covariances from the optimized graph.

Replaces GTSAM ``Marginals(graph, estimate, CHOLESKY)`` as used by the
reference for the two-frame BA edge information
(``/root/reference/gtsam/gtsam_graph.cpp:598-601``) and plane association
(``:1357``): assemble the dense Hessian at the estimate, Cholesky-factor it,
and read the requested block of its inverse by solving against unit
columns. Dense is exact and MXU-friendly at the arena sizes the reference
exercises; the Schur path covers the large-BA regime.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from .assemble import assemble_dense
from .factors import FactorGraph
from .variables import VariableArena, layout_of

__all__ = ["marginal_covariance_cols", "pose_marginal", "plane_marginal",
           "joint_marginal", "pose_marginals_all"]


def _cov_columns(H, cols):
    """Columns of H^-1 at ``cols`` via one Cholesky + triangular solves."""
    L = jnp.linalg.cholesky(H)
    E = jnp.zeros((H.shape[0], cols.shape[0]), H.dtype)
    E = E.at[cols, jnp.arange(cols.shape[0])].set(1.0)
    Y = jsl.solve_triangular(L, E, lower=True)
    X = jsl.solve_triangular(L.T, Y, lower=False)
    return X


@jax.jit
def marginal_covariance_cols(graph: FactorGraph, values: VariableArena,
                             cols):
    """(w, w) marginal covariance of the tangent slots ``cols``."""
    H, _ = assemble_dense(graph, values)
    X = _cov_columns(H, cols)
    return X[cols, :]


def pose_marginal(graph: FactorGraph, values: VariableArena, idx: int):
    """6x6 marginal covariance of pose ``idx`` (tangent = (omega, v))."""
    lay = layout_of(values)
    cols = jnp.asarray(lay.pose_off + 6 * idx + jnp.arange(6))
    return marginal_covariance_cols(graph, values, cols)


def plane_marginal(graph: FactorGraph, values: VariableArena, idx: int):
    """3x3 marginal covariance of plane landmark ``idx``."""
    lay = layout_of(values)
    cols = jnp.asarray(lay.plane_off + 3 * idx + jnp.arange(3))
    return marginal_covariance_cols(graph, values, cols)


def joint_marginal(graph: FactorGraph, values: VariableArena, cols):
    """Joint marginal over an arbitrary tangent slot selection."""
    return marginal_covariance_cols(graph, values, jnp.asarray(cols))


@functools.partial(jax.jit, static_argnames=("n",))
def pose_marginals_all(graph: FactorGraph, values: VariableArena, n: int):
    """(n, 6, 6) marginal covariances of poses 0..n-1 in ONE factorization.

    The per-pose ``Marginals.marginalCovariance`` loop of the reference
    costs a refactorization per query; here one Cholesky is reused across
    all 6n unit-column solves (one (D, 6n) triangular-solve batch — an MXU
    matmul shape), then the diagonal 6x6 blocks are gathered.
    """
    lay = layout_of(values)
    H, _ = assemble_dense(graph, values)
    cols = lay.pose_off + jnp.arange(n * 6)
    X = _cov_columns(H, cols)             # (D, 6n)
    B = X[cols, :]                        # (6n, 6n) joint pose covariance
    idx = jnp.arange(n)
    return B.reshape(n, 6, n, 6)[idx, :, idx, :]
