"""Style system: extractor (mel -> K codes), FSQ quantizer, prompt encoder.

Claims A3 (fixed-length time-varying discrete style codes) and A1/A6
(zero-shot reference-speaker conditioning) of ``/root/reference/README.md:5``;
SURVEY.md §2.2.  The extractor pools a variable-length mel into exactly K
style vectors via learned-query cross-attention (fixed-length regardless of
duration — diffusion cost becomes length-independent, SURVEY.md §5.7).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from styletts_zs_tpu.models.layers import (CrossAttention, TransformerBlock,
                                           sinusoidal_embedding)
from styletts_zs_tpu.ops import fsq
from styletts_zs_tpu.utils.config import PromptEncoderConfig, StyleConfig


class StyleExtractor(nn.Module):
    """Ground-truth/reference mel -> K continuous style vectors (B, K, d_style)."""

    cfg: StyleConfig
    n_mels: int = 80
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jax.Array, *,
                 mask: Optional[jax.Array] = None) -> jax.Array:
        c = self.cfg
        B, T, _ = mel.shape
        h = nn.Dense(c.extractor_dim, dtype=self.dtype, name="mel_in")(mel)
        h = h + sinusoidal_embedding(
            jnp.arange(T), c.extractor_dim)[None].astype(self.dtype)
        for i in range(c.extractor_layers):
            h = TransformerBlock(c.extractor_dim, c.n_heads,
                                 use_pallas=self.use_pallas, dtype=self.dtype,
                                 name=f"enc{i}")(h, mask=mask)
        queries = self.param(
            "queries", nn.initializers.normal(0.02),
            (c.n_codes, c.extractor_dim), jnp.float32)
        q = jnp.broadcast_to(queries[None].astype(self.dtype),
                             (B, c.n_codes, c.extractor_dim))
        for i in range(2):
            attn = CrossAttention(c.extractor_dim, c.n_heads,
                                  use_pallas=self.use_pallas, dtype=self.dtype,
                                  name=f"pool{i}")(
                nn.LayerNorm(dtype=self.dtype)(q), h, ctx_mask=mask)
            q = q + attn
        q = nn.LayerNorm(dtype=self.dtype)(q)
        return nn.Dense(c.d_style, dtype=self.dtype, name="style_out")(q)


class StyleQuantizer(nn.Module):
    """FSQ bottleneck: continuous style vectors -> discrete codes, (B, K, d_style).

    Projects d_style -> len(fsq_levels) dims, quantizes on the FSQ lattice,
    projects back.  ``indices`` exposes the discrete token ids (A3).
    """

    cfg: StyleConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        d = len(self.cfg.fsq_levels)
        self.down = nn.Dense(d, dtype=self.dtype, name="down")
        self.up = nn.Dense(self.cfg.d_style, dtype=self.dtype, name="up")

    def __call__(self, style: jax.Array):
        """Returns (quantized_style (B,K,d_style), codes (B,K,d_fsq), indices)."""
        z = self.down(style)
        codes = fsq.quantize(z, self.cfg.fsq_levels)
        indices = fsq.codes_to_indices(codes, self.cfg.fsq_levels)
        return self.up(codes), codes, indices

    def decode_codes(self, codes: jax.Array) -> jax.Array:
        """FSQ-grid codes (B, K, d_fsq) -> style vectors (B, K, d_style)."""
        return self.up(codes)

    def project_style(self, style: jax.Array) -> jax.Array:
        """Nearest-lattice projection of a CONTINUOUS style vector.

        The inference-path quantizer (r5 fix): ``__call__`` maps
        extractor outputs through ``down``, but ``down ∘ up`` is never
        trained to be the identity, so re-quantizing a point on (or near)
        the lattice's up-image — exactly what a diffusion sample is —
        lands on unrelated codes and scrambles the style (measured on the
        r5 bundle: 0.0 code agreement, speaker retrieval 0/16 —
        ``docs/artifacts/quantizer_roundtrip_r5.json``).  Instead invert
        ``up`` by least squares: for s = up(c) the recovery is exact
        (agreement 1.0), and for a nearby sample it snaps to the closest
        lattice point in the least-squares sense.  W is recovered by
        probing ``up`` with basis vectors (no param introspection), and
        the 6x6 normal equations replace pinv/SVD (TPU-friendly).
        Straight-through gradient through the rounding (stage-3 perceptual
        distillation differentiates through this projection).
        """
        # fp32 MASTER params, not the compute-dtype cast: the rounding below
        # is a discrete decision, and making it from bf16-cast W flips codes
        # near lattice boundaries between the prod and fp32-golden variants
        # (one canonical precision keeps the projection variant-stable)
        up_params = self.up.variables["params"]
        W = jnp.asarray(up_params["kernel"], jnp.float32)       # (d, d_style)
        bias = jnp.asarray(up_params["bias"], jnp.float32)      # (d_style,)
        s = style.astype(jnp.float32) - bias
        G = W @ W.T                                             # (d, d)
        z = (s @ W.T) @ jnp.linalg.inv(G)                       # (..., d)
        lv = jnp.asarray(self.cfg.fsq_levels, jnp.float32)
        digit_c = jnp.clip((z + 1.0) * (lv - 1.0) / 2.0, 0.0, lv - 1.0)
        digit = digit_c + jax.lax.stop_gradient(jnp.round(digit_c) - digit_c)
        codes = 2.0 * digit / (lv - 1.0) - 1.0
        return self.up(codes.astype(style.dtype))

    def decode_indices(self, indices: jax.Array) -> jax.Array:
        return self.up(fsq.indices_to_codes(indices, self.cfg.fsq_levels))


class PromptEncoder(nn.Module):
    """~3 s enrolled reference audio (mel) -> speaker conditioning tokens.

    Zero-shot path (``BASELINE.json:8``): returns (B, n_prompt_tokens, dim)
    cross-attention context plus a pooled (B, dim) summary vector for AdaLN.
    """

    cfg: PromptEncoderConfig
    n_mels: int = 80
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ref_mel: jax.Array, *,
                 mask: Optional[jax.Array] = None):
        c = self.cfg
        B, T, _ = ref_mel.shape
        h = nn.Dense(c.dim, dtype=self.dtype, name="mel_in")(ref_mel)
        h = h + sinusoidal_embedding(
            jnp.arange(T), c.dim)[None].astype(self.dtype)
        for i in range(c.n_layers):
            h = TransformerBlock(c.dim, c.n_heads, use_pallas=self.use_pallas,
                                 dtype=self.dtype, name=f"enc{i}")(h, mask=mask)
        queries = self.param(
            "queries", nn.initializers.normal(0.02),
            (c.n_prompt_tokens, c.dim), jnp.float32)
        q = jnp.broadcast_to(queries[None].astype(self.dtype),
                             (B, c.n_prompt_tokens, c.dim))
        q = q + CrossAttention(c.dim, c.n_heads, use_pallas=self.use_pallas,
                               dtype=self.dtype, name="pool")(
            q, h, ctx_mask=mask)
        tokens = nn.LayerNorm(dtype=self.dtype)(q)
        summary = jnp.mean(tokens, axis=1)
        return tokens, summary
