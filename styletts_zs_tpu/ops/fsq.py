"""Finite Scalar Quantization (FSQ) for the discrete style codes.

Realizes the "fixed-length time-varying discrete style codes" of
``/root/reference/README.md:5`` (claim A3, SURVEY.md §2.1).  FSQ is chosen
over VQ-EMA deliberately (SURVEY.md §2.2): no codebook state, no EMA updates,
no collapse handling — a pure elementwise map that XLA fuses for free, the
TPU-friendly quantizer.

Per channel with L levels:
  bound(z)  = tanh(z + shift) * half_l - offset          (range ≈ (-L/2, L/2-1) for even L)
  digit     = round(bound(z)) + L // 2                   ∈ {0 .. L-1}
  code      = 2 * digit / (L - 1) - 1                    ∈ [-1, 1] exactly
with a straight-through estimator through the round.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _bound_params(levels: tuple[int, ...]):
    lv = np.asarray(levels, dtype=np.float64)
    eps = 1e-3
    half_l = (lv - 1.0) * (1.0 - eps) / 2.0
    offset = np.where(lv % 2 == 0, 0.5, 0.0)
    shift = np.arctanh(offset / half_l)
    return (jnp.asarray(half_l, jnp.float32), jnp.asarray(offset, jnp.float32),
            jnp.asarray(shift, jnp.float32), jnp.asarray(lv, jnp.float32))


def bound(z: jax.Array, levels: tuple[int, ...]) -> jax.Array:
    half_l, offset, shift, _ = _bound_params(levels)
    return jnp.tanh(z.astype(jnp.float32) + shift) * half_l - offset


def quantize(z: jax.Array, levels: tuple[int, ...]) -> jax.Array:
    """z: (..., d) unbounded -> codes on the FSQ grid, in [-1, 1] per channel.

    Differentiable via straight-through: grad(quantize) == grad(bound → rescale).
    """
    _, _, _, lv = _bound_params(levels)
    b = bound(z, levels)
    digit_c = b + lv // 2                       # continuous "digit"
    digit = jnp.round(digit_c)
    digit = digit_c + jax.lax.stop_gradient(digit - digit_c)
    code = 2.0 * digit / (lv - 1.0) - 1.0
    return code.astype(z.dtype)


def codes_to_indices(codes: jax.Array, levels: tuple[int, ...]) -> jax.Array:
    """FSQ-grid codes (..., d) in [-1,1] -> flat int32 lattice indices."""
    lv = np.asarray(levels)
    digits = jnp.round((codes.astype(jnp.float32) + 1.0) * (jnp.asarray(lv, jnp.float32) - 1.0) / 2.0)
    basis = np.concatenate([[1], np.cumprod(lv[:-1])]).astype(np.int32)
    return jnp.sum(digits.astype(jnp.int32) * jnp.asarray(basis),
                   axis=-1).astype(jnp.int32)


def indices_to_codes(indices: jax.Array, levels: tuple[int, ...]) -> jax.Array:
    """Flat int indices -> FSQ-grid codes (..., d) in [-1, 1]."""
    lv = np.asarray(levels)
    basis = np.concatenate([[1], np.cumprod(lv[:-1])]).astype(np.int32)
    digits = (indices[..., None].astype(jnp.int32) // jnp.asarray(basis)) % jnp.asarray(lv)
    return (2.0 * digits.astype(jnp.float32) / (jnp.asarray(lv, jnp.float32) - 1.0) - 1.0)


def codebook_size(levels: tuple[int, ...]) -> int:
    return int(np.prod(levels))
