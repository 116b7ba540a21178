"""Normal-equation assembly from linearized factor blocks.

The reference delegates this to GTSAM/g2o sparse linear algebra
(``LevenbergMarquardtOptimizer`` at gtsam_graph.cpp:1784-1788, CSparse block
solver at g2o/g2o_graph.cpp:65-77). TPU-native version: per-factor outer
products ``J^T J`` are computed batched (MXU) and scatter-added into either a
dense Hessian (small/medium graphs; dense Cholesky is MXU-friendly) or used
matrix-free as Hessian-vector products for PCG (large graphs).
"""

from __future__ import annotations

import jax.numpy as jnp

from .factors import FactorGraph, linearize_blocks
from .variables import VariableArena, used_slot_mask

__all__ = ["assemble_dense", "gradient", "hvp_fn", "diag_precond"]


def assemble_dense(graph: FactorGraph, values: VariableArena):
    """Build dense (H, g) = (J^T J, J^T r) over the global tangent layout.

    Unused (padded) variable slots get a unit diagonal so Cholesky stays
    positive definite; their gradient entries are exactly zero, so their
    update is exactly zero.
    """
    blocks = linearize_blocks(graph, values)
    mask = used_slot_mask(values)
    dim = mask.shape[0]
    H = jnp.diag(1.0 - mask)
    g = jnp.zeros(dim, dtype=mask.dtype)
    for r, J, cols in blocks:
        Hf = jnp.einsum("fei,fej->fij", J, J)
        gf = jnp.einsum("fei,fe->fi", J, r)
        H = H.at[cols[:, :, None], cols[:, None, :]].add(Hf)
        g = g.at[cols].add(gf)
    return H, g


def gradient(graph: FactorGraph, values: VariableArena):
    """g = J^T r without forming H (for convergence checks / CG)."""
    blocks = linearize_blocks(graph, values)
    mask = used_slot_mask(values)
    g = jnp.zeros(mask.shape[0], dtype=mask.dtype)
    for r, J, cols in blocks:
        g = g.at[cols].add(jnp.einsum("fei,fe->fi", J, r))
    return g


def hvp_fn(blocks, mask, lam):
    """Matrix-free (H + lam I) v from linearized blocks.

    Gathers per-factor tangent slices, applies J then J^T, scatter-adds.
    All gathers/scatters have static shapes; XLA fuses the whole product.
    """

    def hvp(v):
        out = lam * v + (1.0 - mask) * v
        for r, J, cols in blocks:
            vb = v[cols]  # (F, td)
            Jv = jnp.einsum("fei,fi->fe", J, vb)
            JtJv = jnp.einsum("fei,fe->fi", J, Jv)
            out = out.at[cols].add(JtJv)
        return out

    return hvp


def diag_precond(blocks, mask, lam):
    """Jacobi preconditioner diagonal of (H + lam I)."""
    d = lam * jnp.ones_like(mask) + (1.0 - mask)
    for r, J, cols in blocks:
        dJ = jnp.einsum("fei,fei->fi", J, J)
        d = d.at[cols].add(dJ)
    return d
