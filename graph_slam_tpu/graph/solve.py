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
    """delta = -(H+lam I)^-1 g by preconditioned CG (fixed trip count).

    Runs under ``lax.while_loop`` with a static iteration bound; early exit
    on relative residual. Deterministic shapes, no host sync.
    """
    b = -g
    Minv = 1.0 / precond_diag

    def cond(state):
        k, x, r, z, p, rz = state
        return (k < max_iters) & (jnp.sqrt(jnp.sum(r * r)) > tol * (1.0 + jnp.sqrt(jnp.sum(b * b))))

    def body(state):
        k, x, r, z, p, rz = state
        Ap = hvp(p)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-300)
        x = x + alpha * p
        r = r - alpha * Ap
        z = Minv * r
        rz_new = jnp.sum(r * z)
        beta = rz_new / jnp.maximum(rz, 1e-300)
        p = z + beta * p
        return k + 1, x, r, z, p, rz_new

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = Minv * r0
    state = (jnp.zeros((), jnp.int32), x0, r0, z0, z0, jnp.sum(r0 * z0))
    _, x, _, _, _, _ = jax.lax.while_loop(cond, body, state)
    return x
