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

__all__ = ["solve_dense", "solve_pcg"]


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
