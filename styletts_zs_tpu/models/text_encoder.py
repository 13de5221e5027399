"""Phoneme text encoder + prosodic text encoder.

Obligations: "phoneme text encoder" (``BASELINE.json:5``) and the text-side
prosody representation (SURVEY.md §2.2).  The lineage used 3xconv + BiLSTM and
a pretrained PL-BERT; this build replaces both with conv + transformer stacks —
BiLSTM is a sequential scan that starves the MXU, and no pretrained weights
are fetchable offline (SURVEY.md §7.0).  The reference repo has no code.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from styletts_zs_tpu.models.layers import (ConvBlock, TransformerBlock,
                                           sinusoidal_embedding)
from styletts_zs_tpu.utils.config import (ProsodyEncoderConfig,
                                          TextEncoderConfig)


class TextEncoder(nn.Module):
    """Phoneme IDs -> contextual text encodings (B, T_text, dim)."""

    cfg: TextEncoderConfig
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, phoneme_ids: jax.Array, *,
                 mask: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        c = self.cfg
        x = nn.Embed(c.vocab_size, c.dim, dtype=self.dtype,
                     name="phoneme_embed")(phoneme_ids)
        pos = sinusoidal_embedding(
            jnp.arange(phoneme_ids.shape[1]), c.dim)[None]
        x = x + pos.astype(self.dtype)
        for i in range(c.n_conv_layers):
            x = ConvBlock(c.dim, kernel=c.conv_kernel, dropout=c.dropout,
                          dtype=self.dtype, name=f"conv{i}")(
                x, deterministic=deterministic)
            if mask is not None:
                x = x * mask[..., None].astype(x.dtype)
        for i in range(c.n_attn_layers):
            x = TransformerBlock(c.dim, c.n_heads, dropout=c.dropout,
                                 use_pallas=self.use_pallas, dtype=self.dtype,
                                 name=f"attn{i}")(
                x, mask=mask, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        if mask is not None:
            x = x * mask[..., None].astype(x.dtype)
        return x


class ProsodyTextEncoder(nn.Module):
    """Text-side prosody features for duration/F0/energy prediction.

    From-scratch transformer replacement for the lineage's PL-BERT
    (SURVEY.md §2.2 "Prosodic text encoder").  Consumes the shared text
    encodings plus its own shallow phoneme embedding.
    """

    cfg: ProsodyEncoderConfig
    vocab_size: int = 192
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, phoneme_ids: jax.Array, text_enc: jax.Array, *,
                 mask: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        c = self.cfg
        x = nn.Embed(self.vocab_size, c.dim, dtype=self.dtype,
                     name="prosody_embed")(phoneme_ids)
        x = x + nn.Dense(c.dim, dtype=self.dtype, name="text_proj")(text_enc)
        x = x + sinusoidal_embedding(
            jnp.arange(phoneme_ids.shape[1]), c.dim)[None].astype(self.dtype)
        for i in range(c.n_layers):
            x = TransformerBlock(c.dim, c.n_heads, dropout=c.dropout,
                                 use_pallas=self.use_pallas, dtype=self.dtype,
                                 name=f"block{i}")(
                x, mask=mask, deterministic=deterministic)
        x = nn.LayerNorm(dtype=self.dtype)(x)
        if mask is not None:
            x = x * mask[..., None].astype(x.dtype)
        return x
