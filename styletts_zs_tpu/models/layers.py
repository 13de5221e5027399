"""Shared neural building blocks (Flax linen) in (B, T, C) layout.

TPU-first choices (SURVEY.md §1.2 L1): transformer/conv blocks instead of the
lineage's BiLSTMs (sequential scans starve the MXU); channels-last so C rides
the 128-wide lane dimension; fp32 softmax/normalization statistics with
bf16-friendly activations.  The reference repo contains no code
(``/root/reference/README.md`` is the entire repo).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from styletts_zs_tpu.kernels import dispatch
from styletts_zs_tpu.ops import norm as norm_ops


def sinusoidal_embedding(positions: jax.Array, dim: int,
                         max_period: float = 10000.0) -> jax.Array:
    """positions: (...,) float/int -> (..., dim) sinusoidal features."""
    half = dim // 2
    freqs = jnp.exp(-np.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    ang = positions.astype(jnp.float32)[..., None] * freqs
    emb = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, 1)])
    return emb


class MLP(nn.Module):
    dim: int
    expand: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim * self.expand, dtype=self.dtype)(x)
        h = jax.nn.gelu(h)
        return nn.Dense(self.dim, dtype=self.dtype)(h)


class SelfAttention(nn.Module):
    """Multi-head self-attention; full or chunk-local (windowed)."""

    dim: int
    n_heads: int
    chunk: Optional[int] = None          # None = full attention
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, mask: Optional[jax.Array] = None):
        B, T, _ = x.shape
        D = self.dim // self.n_heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, self.n_heads, D)
        k = k.reshape(B, T, self.n_heads, D)
        v = v.reshape(B, T, self.n_heads, D)
        if self.chunk is not None:
            out = dispatch.local_attention(q, k, v, chunk=self.chunk,
                                           kv_mask=mask,
                                           use_pallas=self.use_pallas)
        else:
            out = dispatch.full_attention(q, k, v, kv_mask=mask,
                                          use_pallas=self.use_pallas)
        out = out.reshape(B, T, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class CrossAttention(nn.Module):
    dim: int
    n_heads: int
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, ctx, *, ctx_mask: Optional[jax.Array] = None):
        B, T, _ = x.shape
        Tc = ctx.shape[1]
        D = self.dim // self.n_heads
        q = nn.Dense(self.dim, dtype=self.dtype, name="q")(x)
        kv = nn.Dense(2 * self.dim, dtype=self.dtype, name="kv")(ctx)
        k, v = jnp.split(kv, 2, axis=-1)
        q = q.reshape(B, T, self.n_heads, D)
        k = k.reshape(B, Tc, self.n_heads, D)
        v = v.reshape(B, Tc, self.n_heads, D)
        out = dispatch.full_attention(q, k, v, kv_mask=ctx_mask,
                                      use_pallas=self.use_pallas)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(
            out.reshape(B, T, self.dim))


class TransformerBlock(nn.Module):
    """Pre-LN transformer block; optional cross-attention and chunk-local self-attn."""

    dim: int
    n_heads: int
    chunk: Optional[int] = None
    cross: bool = False
    use_pallas: bool = False
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, ctx=None, mask=None, ctx_mask=None,
                 deterministic: bool = True):
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = SelfAttention(self.dim, self.n_heads, chunk=self.chunk,
                          use_pallas=self.use_pallas, dtype=self.dtype)(h, mask=mask)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        x = x + h
        if self.cross:
            h = nn.LayerNorm(dtype=self.dtype)(x)
            h = CrossAttention(self.dim, self.n_heads,
                               use_pallas=self.use_pallas, dtype=self.dtype)(
                h, ctx, ctx_mask=ctx_mask)
            x = x + h
        h = nn.LayerNorm(dtype=self.dtype)(x)
        h = MLP(self.dim, dtype=self.dtype)(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return x + h


class AdaLNTransformerBlock(nn.Module):
    """DiT-style block: AdaLN modulation from a conditioning vector.

    Used by the style-diffusion denoiser (SURVEY.md §2.2 "transformer
    denoiser") — cond carries (timestep, speaker-prompt summary).
    """

    dim: int
    n_heads: int
    cross: bool = False
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cond, *, ctx=None, mask=None, ctx_mask=None):
        # cond: (B, C) -> per-block modulation (6 or 9 chunks)
        n_mod = 9 if self.cross else 6
        mod = nn.Dense(n_mod * self.dim, dtype=self.dtype,
                       kernel_init=nn.initializers.zeros, name="adaln_mod")(
            jax.nn.silu(cond))
        parts = jnp.split(mod, n_mod, axis=-1)
        s1, b1, g1, s2, b2, g2 = parts[:6]

        h = norm_ops.adaln(x, s1, b1)
        h = SelfAttention(self.dim, self.n_heads, use_pallas=self.use_pallas,
                          dtype=self.dtype)(h, mask=mask)
        x = x + g1[:, None, :] * h
        if self.cross:
            s3, b3, g3 = parts[6:]
            h = norm_ops.adaln(x, s3, b3)
            h = CrossAttention(self.dim, self.n_heads,
                               use_pallas=self.use_pallas, dtype=self.dtype)(
                h, ctx, ctx_mask=ctx_mask)
            x = x + g3[:, None, :] * h
        h = norm_ops.adaln(x, s2, b2)
        h = MLP(self.dim, dtype=self.dtype)(h)
        return x + g2[:, None, :] * h


class ConvBlock(nn.Module):
    """Conv1d + LayerNorm + activation (text-encoder prenet style)."""

    dim: int
    kernel: int = 5
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h = nn.Conv(self.dim, (self.kernel,), dtype=self.dtype)(x)
        h = nn.LayerNorm(dtype=self.dtype)(h)
        h = jax.nn.silu(h)
        return nn.Dropout(self.dropout, deterministic=deterministic)(h)


class AdaINResBlock(nn.Module):
    """Style-conditioned residual conv block for the mel decoder.

    The hot fused form lives in styletts_zs_tpu/kernels/decoder_kernels.py;
    this module computes the style projections and calls the dispatch twin.
    """

    dim: int
    kernel: int = 5
    dilation: int = 1
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, style):
        """x: (B, T, C); style: (B, S) or (B, T, S) time-varying."""
        mod = nn.Dense(4 * self.dim, dtype=self.dtype, name="style_mod")(
            jax.nn.silu(style))
        scale, shift = jnp.split(mod, 2, axis=-1)   # each (.., 2*dim)
        k1 = self.param(
            "conv1", nn.initializers.lecun_normal(),
            (self.kernel, self.dim, self.dim), jnp.float32)
        k2 = self.param(
            "conv2", nn.initializers.lecun_normal(),
            (self.kernel, self.dim, self.dim), jnp.float32)
        return dispatch.adain_conv_block(
            x, scale.astype(self.dtype), shift.astype(self.dtype),
            k1.astype(self.dtype), k2.astype(self.dtype),
            dilation=self.dilation, use_pallas=self.use_pallas)
