"""Adversarially-trained mel decoder.

Obligation: "an adversarially-trained mel decoder" with "attention/conv
decoder blocks" as Pallas hot paths (``BASELINE.json:5``), AdaIN-conditioned
per SURVEY.md §2.2 [recon].  Structure: input projection of (aligned text,
F0, energy) -> N AdaIN residual conv blocks interleaved with chunk-local
attention (60 s long-form support, ``BASELINE.json:10``) -> mel head.

Style enters as *time-varying* per-frame vectors (the K fixed-length codes
stretched over the utterance — claim A3) through AdaIN in every block.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from styletts_zs_tpu.models.layers import AdaINResBlock, TransformerBlock
from styletts_zs_tpu.utils.config import DecoderConfig


class MelDecoder(nn.Module):
    cfg: DecoderConfig
    n_mels: int = 80
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, aligned_text: jax.Array, f0: jax.Array,
                 energy: jax.Array, style: jax.Array, *,
                 mask: Optional[jax.Array] = None,
                 return_hidden: bool = False):
        """aligned_text: (B, T, C_text); f0/energy: (B, T); style: (B, T, S).

        Returns mel (B, T, n_mels) [and hidden (B, T, dim) if requested —
        the vocoder can consume hidden features instead of mel].
        """
        c = self.cfg
        B, T, _ = aligned_text.shape
        # prosody embedding: scalar curves -> channels (sinusoidal-free, conv)
        pros = jnp.stack([f0, energy], axis=-1).astype(self.dtype)  # (B, T, 2)
        pros = nn.Conv(c.dim // 4, (3,), dtype=self.dtype, name="pros_in")(pros)
        x = nn.Dense(c.dim, dtype=self.dtype, name="text_in")(aligned_text)
        x = jnp.concatenate([x, pros], axis=-1)
        x = nn.Dense(c.dim, dtype=self.dtype, name="in_proj")(x)

        dilations = (1, 3, 9)
        for i in range(c.n_blocks):
            x = AdaINResBlock(c.dim, kernel=c.conv_kernel,
                              dilation=dilations[i % len(dilations)],
                              use_pallas=self.use_pallas, dtype=self.dtype,
                              name=f"res{i}")(x, style)
            if (i + 1) % c.attn_every == 0:
                x = TransformerBlock(c.dim, c.n_heads, chunk=c.attn_window,
                                     use_pallas=self.use_pallas,
                                     dtype=self.dtype, name=f"attn{i}")(
                    x, mask=mask)
            if mask is not None:
                x = x * mask[..., None].astype(x.dtype)
        hidden = nn.LayerNorm(dtype=self.dtype)(x)
        mel = nn.Dense(self.n_mels, dtype=self.dtype, name="mel_out")(hidden)
        if mask is not None:
            mel = mel * mask[..., None].astype(mel.dtype)
        if return_hidden:
            return mel, hidden
        return mel
