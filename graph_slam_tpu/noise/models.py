"""Noise models as square-root-information matrices, GTSAM-compatible.

The reference uses GTSAM noise models everywhere:
``noiseModel::Diagonal::Sigmas`` (first-node priors,
``/root/reference/gtsam/gtsam_graph.cpp:339-341``),
``noiseModel::Isotropic::Sigma`` (velocity/bias priors ``:361-362``, BA point
and pixel noise ``:512-513``), and ``noiseModel::Gaussian::Information`` (VO
edges with adjoint-conjugated information, ``:688``).

Here every model is *materialized as a dense square-root information matrix*
``S`` with ``S^T S = Lambda`` so all factor tables share one whitening code
path (``whitened = S @ e``) and chi2 = ``e^T Lambda e`` matches GTSAM's
``0.5 * ||whitened||^2`` error convention exactly regardless of which square
root is chosen. Robust (Huber) re-weighting follows GTSAM's m-estimator
semantics and is applied per factor row at linearization time.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "sqrt_info_from_sigmas",
    "sqrt_info_from_information",
    "sqrt_info_from_covariance",
    "isotropic_sqrt_info",
    "huber_weight",
    "ROBUST_NONE",
    "ROBUST_HUBER",
]

ROBUST_NONE = 0
ROBUST_HUBER = 1


def sqrt_info_from_sigmas(sigmas):
    """Diagonal::Sigmas — S = diag(1/sigma)."""
    sigmas = jnp.asarray(sigmas)
    return jnp.vectorize(jnp.diag, signature="(d)->(d,d)")(1.0 / sigmas)


def isotropic_sqrt_info(dim: int, sigma, dtype=jnp.float64):
    """Isotropic::Sigma — S = I/sigma."""
    return jnp.eye(dim, dtype=dtype) / sigma


def sqrt_info_from_information(info):
    """Gaussian::Information — upper-triangular S with S^T S = Lambda.

    Computed as ``chol(Lambda)^T`` (lower^T = upper). Any square root yields
    identical chi2 and identical normal equations, so parity with GTSAM's
    internal choice is automatic.
    """
    info = jnp.asarray(info)
    L = jnp.linalg.cholesky(info)
    return jnp.swapaxes(L, -1, -2)


def sqrt_info_from_covariance(cov):
    """Gaussian::Covariance — square root of cov^-1 via Cholesky of cov.

    With cov = L L^T, S = L^-1 satisfies S^T S = cov^-1; computed stably by
    triangular inversion.
    """
    cov = jnp.asarray(cov)
    L = jnp.linalg.cholesky(cov)
    eye = jnp.broadcast_to(jnp.eye(cov.shape[-1], dtype=cov.dtype), cov.shape)
    import jax.scipy.linalg as jsl

    return jnp.vectorize(
        lambda Li, I: jsl.solve_triangular(Li, I, lower=True),
        signature="(d,d),(d,d)->(d,d)",
    )(L, eye)


def huber_weight(d, k):
    """GTSAM mEstimator::Huber weight: w = 1 for |d| <= k else k/|d|.

    ``d`` is the whitened residual norm (Mahalanobis distance).
    """
    ad = jnp.abs(d)
    return jnp.where(ad <= k, 1.0, k / jnp.where(ad > 0, ad, 1.0))
