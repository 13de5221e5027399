"""Irreducible teacher-forced mel-MAE floor of the synthetic corpus.

The r4 corpus gives every speaker a breath-noise floor (uniform 0.004-0.025,
``pipelines/data.py::_speaker``) so the prompt encoder has a stable timbre
cue.  That noise REALIZATION is unpredictable from the conditioning, so the
held-out teacher-forced mel MAE (``eval.evaluate_acoustic``) has a nonzero
floor even for a perfect model: the best predictor emits the conditional
mean mel (clean harmonics + the speaker's average noise lift) and still
pays the per-realization fluctuation.

Measured here by construction: synthesize the corpus's own harmonic signal
(same formula as ``data.SyntheticDataset._utterance``), add two independent
noise draws n1, n2 at the same per-speaker level, and report

  pairwise   = MAE(mel(clean+n1), mel(clean+n2))      two realizations
  vs_mean    = MAE(mel(clean+n1), mean_k mel(clean+nk))  realization vs the
               conditional-mean mel (64-draw estimate) = the actual floor

averaged over speakers drawn like the corpus draws them.  Obligation:
honest reading of the VERDICT r3 "stage-1 mel MAE <= 0.12" target, which
was set against the r3 corpus (fixed tiny noise) before the
speaker-discriminative corpus change.

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/probe_noise_floor.py
"""
from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, ".")

import jax.numpy as jnp  # noqa: E402

from styletts_zs_tpu.ops import stft as stft_ops  # noqa: E402
from styletts_zs_tpu.utils.config import Config  # noqa: E402


def main():
    cfg = Config()
    a = cfg.model.audio
    rng = np.random.default_rng(0)
    n_frames = 256
    n_samp = n_frames * a.hop_length
    t = np.arange(n_samp) / a.sample_rate
    n_speakers, n_draws = 12, 64

    def mel(w):
        return np.asarray(stft_ops.mel_spectrogram(
            jnp.asarray(w[None].astype(np.float32)), a))[0, :n_frames]

    pairwise, vs_mean, levels = [], [], []
    for _ in range(n_speakers):
        # the corpus's speaker + signal recipe (data.SyntheticDataset)
        f0 = rng.uniform(90.0, 280.0)
        tilt = rng.uniform(-0.5, 0.5)
        harm = rng.uniform(0.4, 1.6, size=5)
        breath = rng.uniform(0.004, 0.025)
        phase = 2 * np.pi * f0 * t
        clean = sum((0.5 ** (h - 1 + tilt)) * harm[h - 1]
                    * np.sin(h * phase) for h in range(1, 6)) * 0.2 * 0.7
        mels = np.stack([mel(clean + breath * rng.standard_normal(n_samp))
                         for _ in range(n_draws)])
        mean_mel = mels.mean(0)
        pairwise.append(float(np.abs(mels[0] - mels[1]).mean()))
        vs_mean.append(float(np.abs(mels[0] - mean_mel).mean()))
        levels.append(float(breath))

    out = {"n_speakers": n_speakers, "n_draws": n_draws,
           "breath_levels": [round(x, 4) for x in levels],
           "mel_mae_two_realizations_mean": round(float(np.mean(pairwise)), 4),
           "mel_mae_vs_conditional_mean": round(float(np.mean(vs_mean)), 4),
           "note": "mel_mae_vs_conditional_mean is the irreducible "
                   "teacher-forced MAE floor of the r4 corpus for a perfect "
                   "model (voiced all-frames case)"}
    print(json.dumps(out, indent=1))
    with open("docs/artifacts/noise_floor_r4.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
