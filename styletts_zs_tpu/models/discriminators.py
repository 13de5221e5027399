"""Multi-modal discriminators for adversarial stage-1 training.

Claim A4 of ``/root/reference/README.md:5``: "trained adversarially with
multi-modal discriminators".  Build set per SURVEY.md §2.2 [recon]:
MPD (multi-period, waveform) + MRD (multi-resolution spectrogram) +
mel-patch discriminator.  All return per-scale logits plus intermediate
feature maps for feature-matching loss.  LSGAN objectives (SURVEY.md §7.2
item 3: stability in bf16).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from styletts_zs_tpu.ops import stft as stft_ops
from styletts_zs_tpu.utils.config import AudioConfig, DiscriminatorConfig


class PeriodDiscriminator(nn.Module):
    """Waveform folded at one period -> conv stack per phase (MPD component).

    The canonical MPD uses (5, 1) 2D kernels on (B, T/p, p, C) — they never
    mix the period axis, so the computation IS a 1D conv over T/p applied
    independently per phase.  TPU layout note: the 2D form's (p, C) minor
    dims lane-pad badly (XLA reported 4-6x padding expansion on the
    (.., 11, 32) tensors, and the train-step trace showed conv fusions at
    98% of the 1 s step), so the phase axis is folded into the BATCH and
    the stack runs as plain channels-last conv1d — identical math, full
    128-lane tiles from C=128 up.
    """

    period: int
    channels: int
    max_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav: jax.Array):
        """wav: (B, T) -> (logits (B, p*T''), features list)."""
        B, T = wav.shape
        p = self.period
        T_pad = ((T + p - 1) // p) * p
        x = jnp.pad(wav, ((0, 0), (0, T_pad - T)), mode="reflect")
        # (B, T/p, p): sample (b, t', j) = wav[b, t'*p + j] -> phase-major
        x = x.reshape(B, T_pad // p, p)
        x = jnp.transpose(x, (0, 2, 1)).reshape(B * p, T_pad // p, 1)
        feats = []
        ch = self.channels
        for i in range(4):
            x = nn.Conv(min(ch, self.max_channels), (5,), strides=(3,),
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = jax.nn.leaky_relu(x, 0.1)
            feats.append(x)
            ch *= 4
        x = nn.Conv(self.max_channels, (5,), dtype=self.dtype,
                    name="conv4")(x)
        x = jax.nn.leaky_relu(x, 0.1)
        feats.append(x)
        logits = nn.Conv(1, (3,), dtype=self.dtype, name="out")(x)
        return logits.reshape(B, -1), feats


class ResolutionDiscriminator(nn.Module):
    """Magnitude spectrogram at one resolution -> band-folded conv1d stack (MRD).

    TPU layout note: the canonical MRD runs (3, 9)-kernel 2D convs over the
    spectrogram as a (B, T', F, 1) image.  On TPU that shape is hostile: the
    C=1 stem lane-pads 128x, every layer's narrow channel dim (32-256) pads
    the (8, 128) tile, and the freq-strided convs relayout between layers —
    a train-step trace attributed 76 of 115 ms to this stack alone.  Here
    the frequency axis is folded into LANES instead: freqs split into
    128-wide bands (the band axis joins the batch), and the stack is plain
    channels-last conv1d over time with dense within-band frequency mixing —
    the same local-frequency inductive bias at band granularity, full
    128-lane tiles everywhere, zero relayouts.  The Nyquist bin is dropped
    to make n_fft/2 divide into bands (a discriminator loses nothing).
    """

    n_fft: int
    hop: int
    channels: int
    max_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav: jax.Array):
        cfg = AudioConfig(n_fft=self.n_fft, win_length=self.n_fft,
                          hop_length=self.hop)
        mag = stft_ops.spectrogram(wav, cfg)  # (B, T', n_freq)
        B, T, F = mag.shape
        bw = 128 if (F - 1) % 128 == 0 else F - 1  # tiny configs: one band
        bands = (F - 1) // bw
        x = mag[..., :F - 1].astype(self.dtype)
        x = x.reshape(B, T, bands, bw)
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(B * bands, T, bw)
        widths = (bw, bw, min(2 * bw, max(self.max_channels, bw)),
                  min(2 * bw, max(self.max_channels, bw)))
        strides = (1, 1, 2, 2)
        feats = []
        for i, (w, s) in enumerate(zip(widths, strides)):
            x = nn.Conv(w, (5,), strides=(s,), dtype=self.dtype,
                        name=f"conv{i}")(x)
            x = jax.nn.leaky_relu(x, 0.1)
            feats.append(x)
        logits = nn.Conv(1, (3,), dtype=self.dtype, name="out")(x)
        return logits.reshape(B, -1), feats


class MelPatchDiscriminator(nn.Module):
    """Mel-spectrogram patch critic (spectral modality on the decoder output).

    Channels-last conv1d over time with the n_mels axis as input channels —
    a PatchGAN over time windows.  Same lane rationale as
    ResolutionDiscriminator: treating mel as a (B, T, n_mels, 1) image puts
    a 1-wide channel dim in the lanes.
    """

    channels: int
    max_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel: jax.Array):
        """mel: (B, T, n_mels)."""
        x = mel.astype(self.dtype)
        feats = []
        ch = 4 * self.channels
        for i in range(4):
            x = nn.Conv(min(ch, self.max_channels), (5,), strides=(2,),
                        dtype=self.dtype, name=f"conv{i}")(x)
            x = jax.nn.leaky_relu(x, 0.1)
            feats.append(x)
            ch *= 2
        logits = nn.Conv(1, (3,), dtype=self.dtype, name="out")(x)
        return logits.reshape(mel.shape[0], -1), feats


class MultiModalDiscriminator(nn.Module):
    """The full critic ensemble over waveform + spectral modalities (A4)."""

    cfg: DiscriminatorConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav: jax.Array, mel: jax.Array):
        """Returns (list of logits, list of feature-lists), one per critic."""
        all_logits, all_feats = [], []
        for p in self.cfg.mpd_periods:
            lg, ft = PeriodDiscriminator(p, self.cfg.channels,
                                         self.cfg.max_channels,
                                         dtype=self.dtype,
                                         name=f"mpd_p{p}")(wav)
            all_logits.append(lg)
            all_feats.append(ft)
        for n_fft, hop in zip(self.cfg.mrd_ffts, self.cfg.mrd_hops):
            lg, ft = ResolutionDiscriminator(n_fft, hop, self.cfg.channels,
                                             self.cfg.max_channels,
                                             dtype=self.dtype,
                                             name=f"mrd_{n_fft}")(wav)
            all_logits.append(lg)
            all_feats.append(ft)
        lg, ft = MelPatchDiscriminator(self.cfg.channels,
                                       self.cfg.max_channels,
                                       dtype=self.dtype, name="melpatch")(mel)
        all_logits.append(lg)
        all_feats.append(ft)
        return all_logits, all_feats


# ---------------------------------------------------------------------------
# LSGAN losses (SURVEY.md §2.2 "Losses")
# ---------------------------------------------------------------------------

def discriminator_loss(real_logits, fake_logits):
    loss = 0.0
    for r, f in zip(real_logits, fake_logits):
        loss += jnp.mean((r - 1.0) ** 2) + jnp.mean(f ** 2)
    return loss / len(real_logits)


def generator_adv_loss(fake_logits):
    loss = 0.0
    for f in fake_logits:
        loss += jnp.mean((f - 1.0) ** 2)
    return loss / len(fake_logits)


def feature_matching_loss(real_feats, fake_feats):
    loss, n = 0.0, 0
    for rf, ff in zip(real_feats, fake_feats):
        for r, f in zip(rf, ff):
            loss += jnp.mean(jnp.abs(r.astype(jnp.float32)
                                     - f.astype(jnp.float32)))
            n += 1
    return loss / max(n, 1)
