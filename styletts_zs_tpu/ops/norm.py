"""Normalization + style conditioning: LayerNorm, AdaIN, AdaLN.

AdaIN/AdaLN are the style-injection mechanism of the mel decoder
(SURVEY.md §2.2 "AdaIN/AdaLN-conditioned conv/attention blocks"; the reference
repo has no code).  Pure functions over (B, T, C) arrays; style is (B, S) or
(B, T, S) already projected to (scale, shift).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def layer_norm(x: jax.Array, *, eps: float = 1e-5,
               gamma: jax.Array | None = None,
               beta: jax.Array | None = None) -> jax.Array:
    """LayerNorm over the channel (last) axis; stats in fp32."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if gamma is not None:
        y = y * gamma.astype(jnp.float32)
    if beta is not None:
        y = y + beta.astype(jnp.float32)
    return y.astype(x.dtype)


def instance_norm(x: jax.Array, *, eps: float = 1e-5) -> jax.Array:
    """InstanceNorm over the time axis, per channel; stats in fp32.

    x: (B, T, C).  Mean/var over T independently per (B, C).
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.var(xf, axis=1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def adain(x: jax.Array, scale: jax.Array, shift: jax.Array, *,
          eps: float = 1e-5) -> jax.Array:
    """Adaptive InstanceNorm: normalize over time, then style-modulate.

    x: (B, T, C); scale/shift: (B, C) or (B, T, C) (time-varying style).
    """
    y = instance_norm(x, eps=eps)
    if scale.ndim == 2:
        scale = scale[:, None, :]
        shift = shift[:, None, :]
    return ((1.0 + scale.astype(jnp.float32)) * y.astype(jnp.float32)
            + shift.astype(jnp.float32)).astype(x.dtype)


def adaln(x: jax.Array, scale: jax.Array, shift: jax.Array, *,
          eps: float = 1e-5) -> jax.Array:
    """Adaptive LayerNorm (DiT-style) for the diffusion transformer.

    x: (B, T, C); scale/shift: (B, C) or (B, T, C).
    """
    y = layer_norm(x, eps=eps)
    if scale.ndim == 2:
        scale = scale[:, None, :]
        shift = shift[:, None, :]
    return ((1.0 + scale.astype(jnp.float32)) * y.astype(jnp.float32)
            + shift.astype(jnp.float32)).astype(x.dtype)
