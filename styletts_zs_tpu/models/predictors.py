"""Duration and prosody (F0/energy) predictors.

Obligation: "duration/prosody predictors" (``BASELINE.json:5``); the CPU
golden config demands a *deterministic* duration path (``BASELINE.json:7``).
Style-conditioned conv stacks — small, latency-bound models; convs fuse well
under XLA.  The reference repo has no code.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from styletts_zs_tpu.utils.config import PredictorConfig


class _StyledConvStack(nn.Module):
    dim: int
    n_layers: int
    kernel: int
    dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, style, *, mask=None, deterministic: bool = True):
        """x: (B, T, C); style: (B, S) global or (B, T, S) per-position."""
        if style.ndim == 2:
            style = jnp.broadcast_to(style[:, None, :],
                                     (x.shape[0], x.shape[1], style.shape[-1]))
        h = jnp.concatenate([x, style.astype(x.dtype)], axis=-1)
        for i in range(self.n_layers):
            h = nn.Conv(self.dim, (self.kernel,), dtype=self.dtype,
                        name=f"conv{i}")(h)
            h = nn.LayerNorm(dtype=self.dtype)(h)
            h = jax.nn.silu(h)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            if mask is not None:
                h = h * mask[..., None].astype(h.dtype)
        return h


class DurationPredictor(nn.Module):
    """Per-phoneme log-duration regression; deterministic rounding at inference."""

    cfg: PredictorConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, prosody_enc: jax.Array, style: jax.Array, *,
                 mask: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        """Returns log1p-duration predictions (B, T_text), masked to 0."""
        h = _StyledConvStack(self.cfg.dim, self.cfg.n_layers, self.cfg.conv_kernel,
                             self.cfg.dropout, dtype=self.dtype)(
            prosody_enc, style, mask=mask, deterministic=deterministic)
        log_dur = nn.Dense(1, dtype=self.dtype, name="out")(h)[..., 0]
        if mask is not None:
            log_dur = log_dur * mask.astype(log_dur.dtype)
        return log_dur

    def to_frames(self, log_dur: jax.Array,
                  mask: Optional[jax.Array] = None) -> jax.Array:
        """Deterministic integer frame counts (BASELINE.json:7)."""
        dur = jnp.round(jnp.expm1(
            jnp.clip(log_dur.astype(jnp.float32), 0.0, 10.0)))
        dur = jnp.clip(dur, 0.0, float(self.cfg.max_duration))
        if mask is not None:
            dur = dur * mask.astype(dur.dtype)
        return dur.astype(jnp.int32)


class ProsodyPredictor(nn.Module):
    """Frame-level F0 and energy curves from aligned prosody features + style.

    Operates at frame rate (inputs already duration-expanded), mirroring the
    lineage shape [recon: SURVEY.md §2.2, med confidence].
    """

    cfg: PredictorConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, aligned_prosody: jax.Array, style: jax.Array, *,
                 mask: Optional[jax.Array] = None,
                 deterministic: bool = True) -> tuple[jax.Array, jax.Array]:
        """Returns (f0, energy), each (B, T_frames).

        f0 is normalized log-F0 (0 = unvoiced/mean), energy is log-energy.
        """
        h = _StyledConvStack(self.cfg.dim, self.cfg.n_layers, self.cfg.conv_kernel,
                             self.cfg.dropout, dtype=self.dtype)(
            aligned_prosody, style, mask=mask, deterministic=deterministic)
        out = nn.Dense(2, dtype=self.dtype, name="out")(h)
        f0, energy = out[..., 0], out[..., 1]
        if mask is not None:
            m = mask.astype(f0.dtype)
            f0, energy = f0 * m, energy * m
        return f0, energy
