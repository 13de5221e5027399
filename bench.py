"""Benchmark: zero-shot synthesis throughput on one chip.

Prints ONE JSON line: audio-seconds synthesized per wall-second per chip at
batch 32 (the ``BASELINE.json:5`` headline; target >= 10x real-time, so
``vs_baseline`` = value / 10).  Runs the full fused program — 3 s prompt
encode + 1-step CFG style diffusion + mel decode + vocoder.

Timing methodology: this box's remote TPU runtime pipelines executions and
its ``block_until_ready`` is a no-op, so per-call time is measured as the
SLOPE of wall time vs number of dispatched iterations, with a scalar
reduction of the final output fetched to force completion — RPC latency and
transfer cost cancel out.  (See memory: tpu-remote-compile-slow.)
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def _timed_iters(fn, reduce_fn, args_for, k: int) -> float:
    t0 = time.perf_counter()
    last = None
    for i in range(k):
        last = fn(*args_for(i))
    _ = float(reduce_fn(*last))  # forces completion of the whole chain
    return time.perf_counter() - t0


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
        k_lo, k_hi = 2, 12
    else:  # CPU smoke fallback
        cfg = tiny_test_config()
        batch = 2
        k_lo, k_hi = 1, 3

    m = cfg.model
    params = init_params(cfg, jax.random.PRNGKey(0))
    fn = jax.jit(make_synthesis_fn(cfg, one_step=True, with_vocoder=True,
                                   n_frames=m.max_frames))

    @jax.jit
    def reduce_out(out, wav):
        return jnp.sum(wav.astype(jnp.float32))

    Tt = m.max_text_len
    ref_frames = 3 * m.audio.sample_rate // m.audio.hop_length
    rng = jax.random.PRNGKey(0)
    phonemes = jax.random.randint(rng, (batch, Tt), 1, 40)
    text_lengths = jnp.full((batch,), Tt, jnp.int32)
    ref_mel = jax.random.normal(rng, (batch, ref_frames, m.audio.n_mels)) * 0.5
    ref_lengths = jnp.full((batch,), ref_frames, jnp.int32)

    def args_for(i):
        return (params, phonemes, text_lengths, ref_mel, ref_lengths,
                jax.random.PRNGKey(i))

    # warmup / compile (both programs)
    out, wav = fn(*args_for(0))
    _ = float(reduce_out(out, wav))

    t_lo = _timed_iters(fn, reduce_out, args_for, k_lo)
    t_hi = _timed_iters(fn, reduce_out, args_for, k_hi)
    dt = max((t_hi - t_lo) / (k_hi - k_lo), 1e-6)

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
