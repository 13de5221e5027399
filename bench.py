"""Benchmark: zero-shot synthesis throughput on one chip.

Prints ONE JSON line: audio-seconds synthesized per wall-second per chip at
batch 32 (the ``BASELINE.json:5`` headline; target >= 10x real-time, so
``vs_baseline`` = value / 10).  Runs the full fused program — 3 s prompt
encode + 1-step CFG style diffusion + mel decode + vocoder — on the real TPU
(falls back to a smaller CPU run if no TPU is visible).
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main():
    from styletts_zs_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from styletts_zs_tpu.pipelines.factory import init_params
    from styletts_zs_tpu.pipelines.infer import make_synthesis_fn
    from styletts_zs_tpu.utils.config import (Config, ModelConfig,
                                              RuntimeConfig, tiny_test_config)

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        cfg = Config(
            model=ModelConfig(max_text_len=256, max_frames=1024),
            runtime=RuntimeConfig(compute_dtype="bfloat16", use_pallas=True),
        )
        batch = 32
        iters = 5
    else:  # CPU smoke fallback
        cfg = tiny_test_config()
        batch = 2
        iters = 2

    m = cfg.model
    params = init_params(cfg, jax.random.PRNGKey(0))
    fn = jax.jit(make_synthesis_fn(cfg, one_step=True, with_vocoder=True,
                                   n_frames=m.max_frames))

    Tt = m.max_text_len
    ref_frames = 3 * m.audio.sample_rate // m.audio.hop_length
    rng = jax.random.PRNGKey(0)
    phonemes = jax.random.randint(rng, (batch, Tt), 1, 40)
    text_lengths = jnp.full((batch,), Tt, jnp.int32)
    ref_mel = jax.random.normal(rng, (batch, ref_frames, m.audio.n_mels)) * 0.5
    ref_lengths = jnp.full((batch,), ref_frames, jnp.int32)

    # warmup / compile
    out, wav = fn(params, phonemes, text_lengths, ref_mel, ref_lengths, rng)
    jax.block_until_ready(wav)

    t0 = time.perf_counter()
    for i in range(iters):
        out, wav = fn(params, phonemes, text_lengths, ref_mel, ref_lengths,
                      jax.random.PRNGKey(i))
        # block every iteration: the remote-runtime pipeline otherwise
        # reports dispatch time, not execution time
        jax.block_until_ready(wav)
    dt = (time.perf_counter() - t0) / iters

    # audio seconds synthesized per call = emitted waveform duration x batch
    # (static per bucket; predicted lengths are meaningless at random init)
    audio_s = batch * wav.shape[1] / m.audio.sample_rate
    audio_s_per_s = audio_s / dt

    print(json.dumps({
        "metric": "audio_s_per_s_per_chip_batch32_1step",
        "value": round(audio_s_per_s, 2),
        "unit": "audio-seconds/s/chip",
        "vs_baseline": round(audio_s_per_s / 10.0, 3),
    }))


if __name__ == "__main__":
    main()
