"""Evaluation metrics: mel MAE, RTF, speaker-similarity proxy.

SURVEY.md §1.2 L4 "eval (mel MAE, RTF, audio-s/s/chip)".  Without human MOS
raters or a pretrained speaker-verification net (offline box), speaker
similarity is proxied by the framework's own prompt-encoder embedding cosine
between the synthesized audio and the reference — a self-consistency check
that tracks whether zero-shot conditioning actually steers the output.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from styletts_zs_tpu.models.tts import StyleTTSZS
from styletts_zs_tpu.ops import stft as stft_ops
from styletts_zs_tpu.pipelines.factory import build_models
from styletts_zs_tpu.utils.config import Config


def mel_mae(pred: jax.Array, target: jax.Array,
            mask: Optional[jax.Array] = None) -> float:
    """Masked mean absolute error between mel spectrograms."""
    diff = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    if mask is not None:
        m = mask.astype(jnp.float32)[..., None]
        return float(jnp.sum(diff * m) / jnp.maximum(
            jnp.sum(m) * pred.shape[-1], 1.0))
    return float(jnp.mean(diff))


def mel_spectral_distance(pred_wav: jax.Array, target_wav: jax.Array,
                          cfg: Config) -> float:
    """Log-mel L1 between two waveforms (crops to common length)."""
    L = min(pred_wav.shape[-1], target_wav.shape[-1])
    a = stft_ops.mel_spectrogram(pred_wav[..., :L], cfg.model.audio)
    b = stft_ops.mel_spectrogram(target_wav[..., :L], cfg.model.audio)
    return float(jnp.mean(jnp.abs(a - b)))


def speaker_similarity(cfg: Config, acoustic_params, wav_a: jax.Array,
                       wav_b: jax.Array) -> np.ndarray:
    """Cosine similarity of prompt-encoder summaries, (B,) per pair."""
    acoustic, _, _, _ = build_models(cfg)

    def embed(wav):
        mel = stft_ops.mel_spectrogram(wav, cfg.model.audio)
        _, summary = acoustic.apply(acoustic_params, mel,
                                    method=StyleTTSZS.encode_prompt)
        return summary.astype(jnp.float32)

    ea, eb = embed(wav_a), embed(wav_b)
    num = jnp.sum(ea * eb, axis=-1)
    den = (jnp.linalg.norm(ea, axis=-1) * jnp.linalg.norm(eb, axis=-1))
    return np.asarray(num / jnp.maximum(den, 1e-8))


def duration_accuracy(pred_dur: jax.Array, true_dur: jax.Array,
                      text_mask: jax.Array) -> dict:
    """Per-phoneme duration agreement metrics."""
    m = np.asarray(text_mask)
    p = np.asarray(pred_dur)[m]
    t = np.asarray(true_dur)[m]
    return {
        "dur_mae_frames": float(np.abs(p - t).mean()),
        "dur_exact_match": float((p == t).mean()),
    }


def f0_rmse(pred_f0: jax.Array, true_f0: jax.Array,
            frame_mask: jax.Array) -> float:
    """RMSE over voiced frames (true_f0 != 0 in normalized-log space)."""
    m = np.asarray(frame_mask) & (np.asarray(true_f0) != 0)
    if not m.any():
        return 0.0
    d = (np.asarray(pred_f0) - np.asarray(true_f0))[m]
    return float(np.sqrt(np.mean(d * d)))
