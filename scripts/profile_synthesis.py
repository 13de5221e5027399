"""Capture + summarize a jax.profiler trace of the fused synthesis program.

SURVEY.md §5.1 profiling evidence. The device-track `jit_fn` duration is an
INDEPENDENT cross-check of the slope-method timing (bench.py): on r2 it
measured 71.65 ms/call vs 71.6 ms from the slope method (batch 32, 1-step,
with vocoder).

Run:  python scripts/profile_synthesis.py [--calls 3] [--logdir /tmp/synth_trace]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from styletts_zs_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def capture(logdir: str, calls: int, batch: int | None = None) -> None:
    from styletts_zs_tpu.pipelines.factory import init_params
    from styletts_zs_tpu.pipelines.infer import make_synthesis_fn
    from styletts_zs_tpu.utils import metrics as M
    from styletts_zs_tpu.utils.config import (Config, ModelConfig,
                                              RuntimeConfig,
                                              tiny_test_config)

    if jax.default_backend() == "tpu":
        cfg = Config(model=ModelConfig(max_text_len=256, max_frames=1024),
                     runtime=RuntimeConfig(compute_dtype="bfloat16",
                                           use_pallas=True))
        B = batch or 32
    else:
        cfg = tiny_test_config()
        B = batch or 2
    m = cfg.model
    params = init_params(cfg, jax.random.PRNGKey(0))
    fn = jax.jit(make_synthesis_fn(cfg, one_step=True, with_vocoder=True,
                                   n_frames=m.max_frames))
    rng = jax.random.PRNGKey(0)
    Tt = m.max_text_len
    rf = 3 * m.audio.sample_rate // m.audio.hop_length
    args = (jax.random.randint(rng, (B, Tt), 1, 40),
            jnp.full((B,), Tt, jnp.int32),
            jax.random.normal(rng, (B, rf, m.audio.n_mels)) * 0.5,
            jnp.full((B,), rf, jnp.int32))
    _, wav = fn(params, *args, rng)  # warm
    float(jnp.sum(wav))
    with M.profile_trace(logdir):
        for i in range(calls):
            _, wav = fn(params, *args, jax.random.PRNGKey(100 + i))
        float(jnp.sum(wav))


def summarize(logdir: str, calls: int) -> dict:
    p = sorted(glob.glob(f"{logdir}/plugins/profile/*/*.trace.json.gz"))[-1]
    d = json.loads(gzip.open(p).read())
    evs = d.get("traceEvents", [])
    pnames = {e["pid"]: e["args"]["name"] for e in evs
              if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = [pid for pid, n in pnames.items() if "TPU" in n]
    agg = collections.Counter()
    cat = collections.Counter()
    for e in evs:
        if e.get("ph") == "X" and e.get("dur") and e.get("pid") in dev:
            agg[e["name"]] += e["dur"]
            hc = e.get("args", {}).get("hlo_category")
            if hc:
                cat[hc] += e["dur"]
    top = {name: round(us / calls / 1e3, 3)
           for name, us in agg.most_common(30)}
    # jit_fn envelope = whole-program device time per call
    prog = [v for k, v in top.items() if k.startswith("jit_fn")]
    return {"trace": p, "device_ms_per_call": prog[0] if prog else None,
            "hlo_category_ms_per_call": {
                k: round(v / calls / 1e3, 2) for k, v in cat.most_common()},
            "top_ops_ms_per_call": top}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--calls", type=int, default=3)
    ap.add_argument("--logdir", default="/tmp/synth_trace")
    ap.add_argument("--batch", type=int, default=None,
                    help="override batch (e.g. 1 for the RTF@1 cross-check, "
                         "VERDICT r2 item 8)")
    args = ap.parse_args()
    capture(args.logdir, args.calls, args.batch)
    print(json.dumps(summarize(args.logdir, args.calls), indent=1))


if __name__ == "__main__":
    main()
