"""Pallas TPU kernel: intensity-gated flood fill for plane region grow.

The plane-propagation region grow (``propagation.propagate_plane``, the
reference's per-pixel BFS hot loop ``regionGrow``
``/root/reference/gtsam/gtsam_graph.cpp:779-859``) iterates
dilate-and-mask ~64 times. As stock XLA that is 64 dependent elementwise
kernels, each reading/writing the full mask from HBM. This kernel runs the
whole fixed-point loop inside VMEM: masks and gates are loaded once, all
iterations execute on-chip, one result is written back.

Shapes are padded to TPU tiles (8, 128) by the wrapper. Falls back to the
XLA scan implementation on non-TPU backends (and is cross-checked against
it in tests via interpreter mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["region_grow_pallas", "region_grow_xla"]


def _shift(x, delta, axis):
    """Zero-padded shift along axis (VPU-friendly: roll + edge mask)."""
    rolled = jnp.roll(x, delta, axis=axis)
    n = x.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    if delta > 0:
        ok = idx >= delta
    else:
        ok = idx < n + delta
    return jnp.where(ok, rolled, 0.0)


def _grow_kernel(seed_ref, member_ref, sm_l_ref, sm_r_ref, sm_u_ref,
                 sm_d_ref, out_ref, *, steps: int):
    member = member_ref[:]
    sm_l = sm_l_ref[:]
    sm_r = sm_r_ref[:]
    sm_u = sm_u_ref[:]
    sm_d = sm_d_ref[:]

    def body(_, mask):
        grown = jnp.maximum(
            jnp.maximum(_shift(mask, 1, 1) * sm_l,
                        _shift(mask, -1, 1) * sm_r),
            jnp.maximum(_shift(mask, 1, 0) * sm_u,
                        _shift(mask, -1, 0) * sm_d),
        )
        return jnp.maximum(mask, grown) * member

    out_ref[:] = jax.lax.fori_loop(0, steps, body, seed_ref[:] * member)


def _pad_to_tile(x, ph, pw):
    h, w = x.shape
    return jnp.pad(x, ((0, ph - h), (0, pw - w)))


@functools.partial(jax.jit, static_argnames=("steps", "interpret"))
def region_grow_pallas(seed, member, sm_l, sm_r, sm_u, sm_d,
                       steps: int = 64, interpret: bool = False):
    """Flood fill ``seed`` within ``member`` gated by smoothness masks.

    All inputs (H, W) bool; returns (H, W) bool. Equivalent to
    ``region_grow_xla`` (tested); executes as ONE Pallas kernel with every
    iteration in VMEM.
    """
    h, w = seed.shape
    ph = (h + 7) // 8 * 8
    pw = (w + 127) // 128 * 128
    f32 = lambda x: _pad_to_tile(x.astype(jnp.float32), ph, pw)

    out = pl.pallas_call(
        functools.partial(_grow_kernel, steps=steps),
        out_shape=jax.ShapeDtypeStruct((ph, pw), jnp.float32),
        interpret=interpret,
    )(f32(seed), f32(member), f32(sm_l), f32(sm_r), f32(sm_u), f32(sm_d))
    return out[:h, :w] > 0.5


def _bshift(x, delta, axis):
    """Zero-padded boolean shift (no wraparound leakage across edges)."""
    rolled = jnp.roll(x, delta, axis=axis)
    n = x.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, axis)
    ok = idx >= delta if delta > 0 else idx < n + delta
    return rolled & ok


def region_grow_xla(seed, member, sm_l, sm_r, sm_u, sm_d, steps: int = 64):
    """Reference XLA implementation (the propagate_plane scan)."""

    def grow(mask, _):
        grown = (
            (_bshift(mask, 1, 1) & sm_l)
            | (_bshift(mask, -1, 1) & sm_r)
            | (_bshift(mask, 1, 0) & sm_u)
            | (_bshift(mask, -1, 0) & sm_d)
        )
        return (mask | grown) & member, None

    mask, _ = jax.lax.scan(grow, seed & member, None, length=steps)
    return mask
