"""Linear solvers for the damped normal equations.

- ``solve_dense``: Cholesky on the dense (H + lam I). O(D^3) but the MXU
  executes it as large batched matmuls; the right default up to a few
  thousand tangent dims (the reference's graphs after keyframing).
- ``solve_pcg``: Jacobi-preconditioned conjugate gradients on the
  matrix-free Hessian product — the scalable path for sphere2500-class
  graphs and BA with many landmarks.

Reference counterpart: GTSAM multifrontal Cholesky inside LM
(gtsam_graph.cpp:1784-1788) and g2o's CSparse solver (g2o_graph.cpp:65-77).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

__all__ = ["solve_dense", "solve_pcg", "inv33"]


def solve_dense(H, g, lam):
    """delta = -(H + lam I)^-1 g via Cholesky."""
    dim = H.shape[0]
    Hd = H + lam * jnp.eye(dim, dtype=H.dtype)
    L = jnp.linalg.cholesky(Hd)
    y = jsl.solve_triangular(L, -g, lower=True)
    return jsl.solve_triangular(L.T, y, lower=False)


def solve_pcg(hvp, g, precond_diag, max_iters: int = 250, tol: float = 1e-10):
    """delta = -(H+lam I)^-1 g by Jacobi-preconditioned CG, fixed trip count.

    A fixed ``fori_loop`` (no convergence predicate) lets XLA pipeline the
    iterations — the residual-norm check in a ``while_loop`` serializes on a
    global reduction every step and measured ~7x slower end-to-end on TPU.
    ``tol`` is retained for API compatibility but the loop always runs
    ``max_iters`` iterations; pick the trip count for the problem class.
    """
    b = -g
    Minv = 1.0 / precond_diag

    def body(_, state):
        x, r, z, p, rz = state
        Ap = hvp(p)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-300)
        x = x + alpha * p
        r = r - alpha * Ap
        z = Minv * r
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.maximum(rz, 1e-300)
        p = z + beta * p
        return (x, r, z, p, rz_new)

    x0 = jnp.zeros_like(b)
    z0 = Minv * b
    state = (x0, b, z0, z0, jnp.sum(b * z0))
    x, *_ = jax.lax.fori_loop(0, max_iters, body, state)
    return x


def solve_pcg_precond(hvp, g, apply_precond, max_iters: int = 250):
    """PCG with a general preconditioner application (block-Jacobi etc.)."""
    b = -g

    def body(_, state):
        x, r, z, p, rz = state
        Ap = hvp(p)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-300)
        x = x + alpha * p
        r = r - alpha * Ap
        z = apply_precond(r)
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.maximum(rz, 1e-300)
        p = z + beta * p
        return (x, r, z, p, rz_new)

    x0 = jnp.zeros_like(b)
    z0 = apply_precond(b)
    state = (x0, b, z0, z0, jnp.sum(b * z0))
    x, *_ = jax.lax.fori_loop(0, max_iters, body, state)
    return x


def inv33(A):
    """Closed-form batched 3x3 inverse (adjugate / determinant).

    Replaces ``jnp.linalg.inv`` for the block-Jacobi preconditioner: the
    LAPACK-style batched-inverse custom call showed up as ~4 ms per GN
    iteration in the TPU device trace, while the cofactor form is pure
    elementwise arithmetic that fuses into the surrounding kernels
    (measured ~12%% whole-iteration speedup on sphere2500).
    """
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    inv_det = 1.0 / det
    return jnp.stack([
        jnp.stack([A11, A12, A13], -1),
        jnp.stack([A21, A22, A23], -1),
        jnp.stack([A31, A32, A33], -1),
    ], -2) * inv_det[..., None, None]
