"""Benchmark: zero-shot synthesis throughput on one chip.

Prints ONE JSON line carrying the ``BASELINE.json:2`` metric triple:
  - value:      audio-seconds synthesized per wall-second per chip at batch
                32 (headline; target >= 10x real-time, so ``vs_baseline`` =
                value / 10) — full fused program: 3 s prompt encode + 1-step
                CFG style diffusion + mel decode + vocoder.
  - rtf_batch1: real-time factor at batch 1 (same fused program).
  - mel_mae:    masked mel MAE of the bench config (bf16 + Pallas) vs the
                fp32 XLA-twin golden path at batch 1 (SURVEY.md §0: the
                golden IS the fp32 no-Pallas path).

Timing: slope method (``styletts_zs_tpu.utils.metrics.slope_time``) — this
box's remote TPU runtime pipelines executions and its ``block_until_ready``
is a no-op, so per-call time is the SLOPE of wall time vs dispatched
iterations with a scalar fetch forcing completion; RPC latency and transfer
cost cancel out.  Validated at 98% bf16 peak on a pure matmul chain.
"""
from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp


def _synth_args(m, batch: int, seed: int = 0):
    rng = jax.random.PRNGKey(seed)
    Tt = m.max_text_len
    ref_frames = 3 * m.audio.sample_rate // m.audio.hop_length
    return (
        jax.random.randint(rng, (batch, Tt), 1, 40),
        jnp.full((batch,), Tt, jnp.int32),
        jax.random.normal(rng, (batch, ref_frames, m.audio.n_mels)) * 0.5,
        jnp.full((batch,), ref_frames, jnp.int32),
    )


def main():
    from styletts_zs_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from styletts_zs_tpu.pipelines.factory import init_params
    from styletts_zs_tpu.pipelines.infer import make_synthesis_fn
    from styletts_zs_tpu.utils import metrics as metrics_lib
    from styletts_zs_tpu.utils.config import (Config, ModelConfig,
                                              RuntimeConfig, replace,
                                              tiny_test_config)

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        cfg = Config(
            model=ModelConfig(max_text_len=256, max_frames=1024),
            runtime=RuntimeConfig(compute_dtype="bfloat16", use_pallas=True),
        )
        batch = 32
        k_lo, k_hi = 2, 12
    else:  # CPU smoke fallback
        cfg = tiny_test_config()
        batch = 2
        k_lo, k_hi = 1, 3

    m = cfg.model
    params = init_params(cfg, jax.random.PRNGKey(0))
    fn = jax.jit(make_synthesis_fn(cfg, one_step=True, with_vocoder=True,
                                   n_frames=m.max_frames))
    static = _synth_args(m, batch)

    def args_for(i):
        return (params, *static, jax.random.PRNGKey(i))

    def fn_wav(params, phonemes, text_lengths, ref_mel, ref_lengths, rng):
        out, wav = fn(params, phonemes, text_lengths, ref_mel, ref_lengths,
                      rng)
        return wav

    _, wav = fn(*args_for(0))
    dt = metrics_lib.slope_time(fn_wav, args_for, k_lo=k_lo, k_hi=k_hi)
    audio_s = batch * wav.shape[1] / m.audio.sample_rate
    rec = {
        "metric": "audio_s_per_s_per_chip_batch32_1step",
        "value": round(audio_s / dt, 2),
        "unit": "audio-seconds/s/chip",
        "vs_baseline": round(audio_s / dt / 10.0, 3),
    }

    # --- RTF at batch 1 (BASELINE.json:2 "RTF at batch 1") ---------------
    try:
        static1 = _synth_args(m, 1)

        def args1_for(i):
            return (params, *static1, jax.random.PRNGKey(i))

        _, wav1 = fn(*args1_for(0))
        dt1 = metrics_lib.slope_time(fn_wav, args1_for, k_lo=k_lo, k_hi=k_hi)
        rec["rtf_batch1"] = round((wav1.shape[1] / m.audio.sample_rate) / dt1,
                                  2)
    except Exception as e:  # never lose the headline line
        print(f"bench: rtf_batch1 failed: {e!r}", file=sys.stderr)

    # --- mel MAE vs the fp32 XLA golden at batch 1 ------------------------
    try:
        golden_cfg = replace(
            cfg, runtime=RuntimeConfig(compute_dtype="float32",
                                       use_pallas=False))
        fn_g = jax.jit(make_synthesis_fn(golden_cfg, one_step=True,
                                         with_vocoder=True,
                                         n_frames=m.max_frames))
        out_b, _ = fn(params, *static1, jax.random.PRNGKey(0))
        out_g, _ = fn_g(params, *static1, jax.random.PRNGKey(0))
        import numpy as np
        mask = np.asarray(out_g.frame_mask)[..., None]
        mel_b = np.asarray(out_b.mel, np.float32)
        mel_g = np.asarray(out_g.mel, np.float32)
        mae = (np.abs((mel_b - mel_g) * mask).sum()
               / max(mask.sum() * mel_g.shape[-1], 1))
        rec["mel_mae_vs_fp32_golden"] = round(float(mae), 5)
        # r5: this gate runs UNTRAINED params, whose sampled styles land
        # near FSQ lattice boundaries — 1-2 of the 50 codes legitimately
        # flip between bf16 and fp32 variants (98% agree) and each flipped
        # code shifts its decoded segment O(1).  Pre-r5 the broken down-path
        # re-quantization collapsed all styles identically in both variants
        # and hid this (0.069).  The kernel-parity reading is the TRAINED-
        # bundle drift curve: 0.033-0.082 over 256-4864 frames, kernel
        # share <=0.0008 (docs/artifacts/bf16_drift_r5.json; docs/STATUS.md).
        rec["mel_mae_note"] = ("untrained-params gate incl. discrete FSQ "
                               "code flips; trained-bundle drift 0.043@1024"
                               " w/ kernel share <=0.0008 — see STATUS")
    except Exception as e:
        print(f"bench: mel_mae failed: {e!r}", file=sys.stderr)

    print(json.dumps(rec))


if __name__ == "__main__":
    main()
