"""Top-level StyleTTS-ZS acoustic model (text + style -> mel).

Assembles the L2 model layer of SURVEY.md §1.2 around the call-stack contract
of SURVEY.md §3.1: text encoding, duration prediction, monotonic expansion,
prosody prediction, and the AdaIN mel decoder.  The diffusion sampler
(models/diffusion.py) produces the style codes at inference; here they are an
input, which is exactly acceptance config 1 ("fixed style code",
``BASELINE.json:7``).  Vocoder and discriminators are separate top-level
modules (stagewise training, SURVEY.md §3.3).
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from styletts_zs_tpu.models.decoder import MelDecoder
from styletts_zs_tpu.models.predictors import DurationPredictor, ProsodyPredictor
from styletts_zs_tpu.models.style import (PromptEncoder, StyleExtractor,
                                          StyleQuantizer)
from styletts_zs_tpu.models.text_encoder import ProsodyTextEncoder, TextEncoder
from styletts_zs_tpu.ops import align
from styletts_zs_tpu.ops.attention import length_mask
from styletts_zs_tpu.utils.config import ModelConfig


@flax.struct.dataclass
class AcousticOutput:
    """Pytree output of the synthesis path (jit-returnable)."""

    mel: jax.Array               # (B, T_frames, n_mels)
    hidden: jax.Array            # (B, T_frames, dim) decoder features
    log_dur: jax.Array           # (B, T_text) predicted log1p durations
    durations: jax.Array         # (B, T_text) int frames actually used
    f0: jax.Array                # (B, T_frames)
    energy: jax.Array            # (B, T_frames)
    frame_lengths: jax.Array     # (B,)
    frame_mask: jax.Array        # (B, T_frames) bool


class StyleTTSZS(nn.Module):
    """Acoustic model: phonemes + time-varying style -> mel (+ prosody)."""

    cfg: ModelConfig
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.text_encoder = TextEncoder(c.text_encoder, use_pallas=self.use_pallas,
                                        dtype=self.dtype)
        self.prosody_encoder = ProsodyTextEncoder(
            c.prosody_encoder, vocab_size=c.text_encoder.vocab_size,
            use_pallas=self.use_pallas, dtype=self.dtype)
        self.style_extractor = StyleExtractor(c.style, n_mels=c.audio.n_mels,
                                              use_pallas=self.use_pallas,
                                              dtype=self.dtype)
        self.quantizer = StyleQuantizer(c.style, dtype=self.dtype)
        self.prompt_encoder = PromptEncoder(c.prompt_encoder,
                                            n_mels=c.audio.n_mels,
                                            use_pallas=self.use_pallas,
                                            dtype=self.dtype)
        self.duration_predictor = DurationPredictor(c.predictor, dtype=self.dtype)
        self.prosody_predictor = ProsodyPredictor(c.predictor, dtype=self.dtype)
        self.decoder = MelDecoder(c.decoder, n_mels=c.audio.n_mels,
                                  use_pallas=self.use_pallas, dtype=self.dtype)
        self.align_mel_proj = nn.Dense(128, dtype=self.dtype)
        self.align_text_proj = nn.Dense(128, dtype=self.dtype)

    # ------------------------------------------------------------------
    # pieces
    # ------------------------------------------------------------------

    def encode_text(self, phoneme_ids, text_mask, *, deterministic=True):
        text_enc = self.text_encoder(phoneme_ids, mask=text_mask,
                                     deterministic=deterministic)
        pros_enc = self.prosody_encoder(phoneme_ids, text_enc, mask=text_mask,
                                        deterministic=deterministic)
        return text_enc, pros_enc

    def extract_style(self, mel, frame_mask):
        """Training path: ground-truth mel -> quantized style (B, K, d_style)."""
        s = self.style_extractor(mel, mask=frame_mask)
        return self.quantizer(s)  # (styled, codes, indices)

    def encode_prompt(self, ref_mel, ref_mask=None):
        return self.prompt_encoder(ref_mel, mask=ref_mask)

    # ------------------------------------------------------------------
    # main forward
    # ------------------------------------------------------------------

    def text_to_mel(self, phoneme_ids: jax.Array, style: jax.Array, *,
                    text_mask: Optional[jax.Array] = None,
                    durations: Optional[jax.Array] = None,
                    f0_target: Optional[jax.Array] = None,
                    energy_target: Optional[jax.Array] = None,
                    n_frames: Optional[int] = None,
                    deterministic: bool = True) -> AcousticOutput:
        """The core synthesis path (SURVEY.md §3.1 middle section).

        phoneme_ids: (B, T_text) int32; style: (B, K, d_style) time-varying
        style vectors (quantized or sampled).  If ``durations`` is given
        (training with aligner targets) it overrides the predictor's output.
        """
        c = self.cfg
        n_frames = n_frames or c.max_frames
        if text_mask is None:
            text_mask = jnp.ones(phoneme_ids.shape, dtype=bool)

        text_enc, pros_enc = self.encode_text(phoneme_ids, text_mask,
                                              deterministic=deterministic)

        style_global = jnp.mean(style, axis=1)  # (B, d_style)
        log_dur = self.duration_predictor(pros_enc, style_global,
                                          mask=text_mask,
                                          deterministic=deterministic)
        if durations is None:
            durations = self.duration_predictor.to_frames(log_dur, text_mask)
        frame_lengths = jnp.minimum(jnp.sum(durations, axis=-1),
                                    n_frames).astype(jnp.int32)
        frame_mask = length_mask(frame_lengths, n_frames)

        aligned_text = align.expand_by_duration(text_enc, durations, n_frames)
        aligned_pros = align.expand_by_duration(pros_enc, durations, n_frames)
        style_frames = align.stretch_style_codes(style, frame_lengths, n_frames)

        f0, energy = self.prosody_predictor(aligned_pros, style_frames,
                                            mask=frame_mask,
                                            deterministic=deterministic)
        f0_in = f0 if f0_target is None else f0_target
        energy_in = energy if energy_target is None else energy_target

        mel, hidden = self.decoder(aligned_text, f0_in, energy_in, style_frames,
                                   mask=frame_mask, return_hidden=True)
        return AcousticOutput(mel=mel, hidden=hidden, log_dur=log_dur,
                              durations=durations, f0=f0, energy=energy,
                              frame_lengths=frame_lengths,
                              frame_mask=frame_mask)

    def __call__(self, phoneme_ids, style, *, text_mask=None):
        """Init-friendly entry: the config-1 deterministic path."""
        return self.text_to_mel(phoneme_ids, style, text_mask=text_mask)

    def align_energies(self, text_enc: jax.Array, mel: jax.Array,
                       *, text_mask=None) -> jax.Array:
        """Alignment energies (B, T_frames, T_text) for the built-in aligner.

        Scaled dot-product between projected mel frames and text encodings;
        consumed by ``ops.align.forward_sum_loss`` (training objective) and
        ``ops.align.monotonic_alignment_search`` (hard duration targets).
        Self-contained replacement for an external forced aligner
        (SURVEY.md §7.0/§7.2-4).
        """
        q = self.align_mel_proj(mel)
        k = self.align_text_proj(text_enc)
        energies = jnp.einsum("bfd,btd->bft", q, k,
                              preferred_element_type=jnp.float32) * (128 ** -0.5)
        if text_mask is not None:
            energies = jnp.where(text_mask[:, None, :], energies, -1e9)
        return energies

    def quantize_style(self, style: jax.Array) -> jax.Array:
        """Project sampled continuous style onto the discrete FSQ lattice.

        Inference path (SURVEY.md §3.1 "quantize → style codes"): the
        diffusion sampler emits continuous (B, K, d_style) vectors; this maps
        them to the nearest discrete style code and back to decoder space.

        r5: least-squares inversion of ``up`` (StyleQuantizer.project_style),
        NOT the training-path ``down`` projection — ``down ∘ up`` is
        untrained and scrambled every already-quantized or sampled style it
        re-quantized (0.0 code agreement, speaker retrieval 0/16 on the r5
        bundle; ``docs/artifacts/quantizer_roundtrip_r5.json``).  On lattice
        images the projection is exact, so this map is idempotent.
        """
        return self.quantizer.project_style(style)

    def init_all(self, phoneme_ids, mel_gt, ref_mel, durations):
        """Touches every submodule so ``init`` creates the full param tree."""
        out, _, _ = self.reconstruct(phoneme_ids, mel_gt, durations)
        tokens, _ = self.encode_prompt(ref_mel)
        text_enc, _ = self.encode_text(
            phoneme_ids, jnp.ones(phoneme_ids.shape, bool))
        _ = self.align_energies(text_enc, mel_gt)
        return out.mel

    # ------------------------------------------------------------------

    def reconstruct(self, phoneme_ids, mel_gt, durations, *,
                    text_mask=None, frame_mask=None,
                    f0_target=None, energy_target=None,
                    deterministic: bool = True):
        """Stage-1 training forward (SURVEY.md §3.3): style from ground truth.

        Returns (AcousticOutput, style_codes_z, quantized_style).
        """
        styled, codes, _ = self.extract_style(mel_gt, frame_mask)
        out = self.text_to_mel(
            phoneme_ids, styled, text_mask=text_mask, durations=durations,
            f0_target=f0_target, energy_target=energy_target,
            n_frames=mel_gt.shape[1], deterministic=deterministic)
        return out, codes, styled
