"""Scaling-efficiency harness: throughput vs mesh size (BASELINE.json:5).

Target: >=90% efficiency from 1 chip to a v5e-16 slice.  On this 1-chip box
the harness validates the mechanism on virtual CPU devices (not a perf
statement); on a real slice run it as-is per host:

    JAX_PLATFORMS=tpu python scripts/scaling_bench.py --mesh 1 2 4 8

Prints one JSON line per mesh size with audio-s/s and efficiency vs linear
scaling of the 1-device number.
"""
from __future__ import annotations

import argparse
import json
import sys


import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def run_for_mesh(n_dev: int, *, batch_per_dev: int, cfg, params, base=None):
    from styletts_zs_tpu.parallel import mesh as mesh_lib
    from styletts_zs_tpu.pipelines.infer import make_synthesis_fn

    mesh = mesh_lib.make_mesh(data=n_dev, model=1,
                              devices=jax.devices()[:n_dev])
    m = cfg.model
    B = batch_per_dev * n_dev
    fn = jax.jit(make_synthesis_fn(cfg, one_step=True, with_vocoder=True,
                                   n_frames=m.max_frames))
    rng = jax.random.PRNGKey(0)
    Tt = m.max_text_len
    ref_frames = 3 * m.audio.sample_rate // m.audio.hop_length
    bs = mesh_lib.batch_sharding(mesh)
    rep = mesh_lib.replicated(mesh)
    args = (
        jax.device_put(params, rep),
        jax.device_put(jax.random.randint(rng, (B, Tt), 1, 40), bs),
        jax.device_put(jnp.full((B,), Tt, jnp.int32), bs),
        jax.device_put(
            jax.random.normal(rng, (B, ref_frames, m.audio.n_mels)) * 0.5, bs),
        jax.device_put(jnp.full((B,), ref_frames, jnp.int32), bs),
        rng,
    )
    from styletts_zs_tpu.utils import metrics as metrics_lib
    out, wav = fn(*args)
    k_lo, k_hi = (2, 8) if jax.default_backend() == "tpu" else (1, 4)

    def args_for(i):  # vary the PRNG key per dispatch: identical repeated
        # dispatches get coalesced by the remote runtime (CLAUDE.md rule 3)
        return (*args[:-1], jax.random.PRNGKey(i))

    dt = metrics_lib.slope_time(fn, args_for, k_lo=k_lo, k_hi=k_hi)
    # synthesized capacity (program output length), like bench.py — NOT
    # predicted frame_lengths, which are ~0 under random-init params
    audio_s = B * wav.shape[1] / m.audio.sample_rate
    thr = audio_s / dt
    eff = None if base is None else thr / max(base * n_dev, 1e-9)
    print(json.dumps({"n_devices": n_dev, "audio_s_per_s": round(thr, 2),
                      "efficiency_vs_linear": None if eff is None
                      else round(eff, 3)}))
    return thr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--batch-per-dev", type=int, default=8)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model (CPU mechanism validation)")
    args = ap.parse_args()

    from styletts_zs_tpu.pipelines.factory import init_params
    from styletts_zs_tpu.utils.cache import enable_compilation_cache
    from styletts_zs_tpu.utils.config import (Config, ModelConfig,
                                              RuntimeConfig, tiny_test_config)
    enable_compilation_cache()

    if args.tiny or jax.default_backend() == "cpu":
        cfg = tiny_test_config()
    else:
        cfg = Config(model=ModelConfig(max_text_len=256, max_frames=1024),
                     runtime=RuntimeConfig(compute_dtype="bfloat16",
                                           use_pallas=True))
    params = init_params(cfg, jax.random.PRNGKey(0))
    base = None
    for n in args.mesh:
        if n > len(jax.devices()):
            break
        thr = run_for_mesh(n, batch_per_dev=args.batch_per_dev, cfg=cfg,
                           params=params, base=base)
        if base is None:
            base = thr


if __name__ == "__main__":
    main()
