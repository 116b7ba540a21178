"""Accurate trigonometric primitives.

The XLA CPU backend in this environment evaluates ``jnp.sin``/``jnp.cos``
(and ``jnp.exp``) through a fast-math path with only ~1e-8 absolute accuracy
in float64 (measured: sin(1.0) off by 1.5e-8, cos(0.3) off by 1.5e-8). The
framework's parity target — final chi2 within 1e-6 *relative* of the GTSAM
reference — cannot survive 1e-8 errors inside every rotation, so float64
trig is computed here from scratch: Cody–Waite argument reduction by pi/2
with a three-way split constant, followed by Taylor polynomials on
[-pi/4, pi/4] (only add/mul, which XLA computes exactly to f64 rounding).

float32 inputs fall through to ``jnp``: 1e-8 error is below f32 resolution,
and on TPU the stock path is faster.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["sincos", "sin", "cos", "one_minus_cos"]

# pi/2 = _C1 + _C2 + _C3 (Cody–Waite split, each piece exactly representable)
_C1 = 1.57079632673412561417e00
_C2 = 6.07710050650619224932e-11
_C3 = 2.02226624879595063154e-21
_TWO_OVER_PI = 0.63661977236758134308


def _poly_sin(r, r2):
    # sin(r) = r * P(r^2), |r| <= pi/4 ; terms through r^17
    p = r2 * (1.0 / 355687428096000.0)
    p = r2 * (p - 1.0 / 1307674368000.0)
    p = r2 * (p + 1.0 / 6227020800.0)
    p = r2 * (p - 1.0 / 39916800.0)
    p = r2 * (p + 1.0 / 362880.0)
    p = r2 * (p - 1.0 / 5040.0)
    p = r2 * (p + 1.0 / 120.0)
    p = r2 * (p - 1.0 / 6.0)
    return r * (1.0 + p)


def _poly_cos(r2):
    # cos(r) = Q(r^2), |r| <= pi/4 ; terms through r^16
    q = r2 * (1.0 / 20922789888000.0)
    q = r2 * (q - 1.0 / 87178291200.0)
    q = r2 * (q + 1.0 / 479001600.0)
    q = r2 * (q - 1.0 / 3628800.0)
    q = r2 * (q + 1.0 / 40320.0)
    q = r2 * (q - 1.0 / 720.0)
    q = r2 * (q + 1.0 / 24.0)
    q = r2 * (q - 0.5)
    return 1.0 + q


def _sincos_f64(x):
    n = jnp.round(x * _TWO_OVER_PI)
    r = ((x - n * _C1) - n * _C2) - n * _C3
    r2 = r * r
    s = _poly_sin(r, r2)
    c = _poly_cos(r2)
    k = jnp.asarray(n, jnp.int32) & 3
    # quadrant rotation: (sin, cos) -> k=0:(s,c) 1:(c,-s) 2:(-s,-c) 3:(-c,s)
    sin_out = jnp.where(
        k == 0, s, jnp.where(k == 1, c, jnp.where(k == 2, -s, -c))
    )
    cos_out = jnp.where(
        k == 0, c, jnp.where(k == 1, -s, jnp.where(k == 2, -c, s))
    )
    return sin_out, cos_out


def sincos(x):
    """Accurate (sin, cos) pair; full f64 precision for |x| < ~1e6."""
    x = jnp.asarray(x)
    if x.dtype == jnp.float64:
        return _sincos_f64(x)
    return jnp.sin(x), jnp.cos(x)


def sin(x):
    return sincos(x)[0]


def cos(x):
    return sincos(x)[1]


def one_minus_cos(x):
    """Accurate ``1 - cos(x)`` (no cancellation): 2 sin^2(x/2)."""
    s = sin(0.5 * jnp.asarray(x))
    return 2.0 * s * s
