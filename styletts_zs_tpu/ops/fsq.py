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


def soft_digit_probs(z: jax.Array, levels: tuple[int, ...],
                     tau: float = 1.0):
    """Differentiable per-dim level-assignment probabilities.

    z: (..., d) pre-quantizer activations.  Returns (probs (..., d, Lmax),
    level_mask (d, Lmax)) where probs is a softmax over squared distance of
    the continuous digit to each integer level (invalid levels masked).
    Basis for the usage-entropy regularizer below.
    """
    _, _, _, lv = _bound_params(levels)
    digit_c = bound(z, levels) + lv // 2            # (..., d) in [0, L-1]
    l_max = max(levels)
    ks = jnp.arange(l_max, dtype=jnp.float32)
    d2 = (digit_c[..., None] - ks) ** 2             # (..., d, Lmax)
    level_mask = ks[None, :] < lv[:, None]          # (d, Lmax)
    logits = jnp.where(level_mask, -d2 / tau, -1e9)
    return jax.nn.softmax(logits, axis=-1), level_mask


def entropy_losses(z: jax.Array, levels: tuple[int, ...],
                   tau: float = 1.0) -> tuple[jax.Array, jax.Array]:
    """(sample_entropy, codebook_entropy) per-dim means, in nats.

    Codebook-usage regularizer (VERDICT r3 item 6: dim perplexity 1.0/5 —
    a dead dim — because nothing in the stage-1 objective rewards spreading
    mass across the lattice; the post-FSQ ``up`` projection can compensate
    for any collapse).  Minimize ``sample_entropy - codebook_entropy``:
    confident per-sample assignments whose batch marginal is uniform.
    Standard entropy-bonus shape used with learned discrete bottlenecks —
    here computed purely elementwise, XLA-fusable, no codebook state.
    """
    p, level_mask = soft_digit_probs(z, levels, tau)
    p32 = p.astype(jnp.float32)
    eps = 1e-9
    flat = p32.reshape(-1, *p32.shape[-2:])          # (N, d, Lmax)
    sample_ent = -jnp.sum(flat * jnp.log(flat + eps), axis=-1)   # (N, d)
    sample_ent = jnp.mean(sample_ent)
    marginal = jnp.mean(flat, axis=0)                # (d, Lmax)
    code_ent = -jnp.sum(
        jnp.where(level_mask, marginal * jnp.log(marginal + eps), 0.0),
        axis=-1)                                     # (d,)
    return sample_ent, jnp.mean(code_ent)
