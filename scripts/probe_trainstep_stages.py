"""Per-stage train-step time + MFU table (VERDICT r2 item 7).

Slope-timed (chained evolving train state — no dispatch repeats input
values; CLAUDE.md timing rules) stage-1/2/3 train steps at the pipeline's
production shapes (batch 16 x 256 frames), with FLOP counts from XLA's own
cost analysis and %-of-197TF bf16 peak.

    python scripts/probe_trainstep_stages.py [--batch 16] [--frames 256]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import jax

sys.path.insert(0, ".")

from styletts_zs_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

PEAK_BF16 = 197e12


def _flops(lowered_compiled) -> float:
    ca = lowered_compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0)) if ca else 0.0


def measure_stage(stage: int, *, batch: int, n_frames: int,
                  k_lo: int = 2, k_hi: int = 8, tiny: bool = False):
    from styletts_zs_tpu.pipelines import train as T
    from styletts_zs_tpu.pipelines.data import SyntheticDataset
    from styletts_zs_tpu.pipelines.factory import init_params
    from styletts_zs_tpu.utils.config import (Config, ModelConfig,
                                              RuntimeConfig,
                                              tiny_test_config)

    if tiny:  # CPU smoke of the probe machinery itself
        cfg = tiny_test_config()
        n_frames = min(n_frames, cfg.model.max_frames)
    else:
        cfg = Config(model=ModelConfig(max_text_len=256, max_frames=n_frames),
                     runtime=RuntimeConfig(compute_dtype="bfloat16",
                                           use_pallas=True))
    params = init_params(cfg, jax.random.PRNGKey(0), with_discriminator=True)
    ds = SyntheticDataset(cfg.model, batch_size=batch, seed=0,
                          n_frames=n_frames)
    batch_dev = T.batch_to_device(ds.next_batch())
    acoustic = jax.tree.map(jax.numpy.array, params["acoustic"])

    if stage == 1:
        tr = T.Stage1Trainer(cfg)
        state = tr.init_state(params)
        step = lambda s, i: tr.train_step(s, batch_dev, jax.random.PRNGKey(i))
        # .lower on the jit wrapper does not bind self (static arg)
        low = tr.train_step.lower(tr, state, batch_dev, jax.random.PRNGKey(0))
        fetch = lambda m: float(m["total_g"])
    elif stage == 2:
        tr = T.Stage2Trainer(cfg)
        state = tr.init_state(params["diffusion"])
        step = lambda s, i: tr.train_step(s, acoustic, batch_dev,
                                          jax.random.PRNGKey(i))
        low = tr.train_step.lower(tr, state, acoustic, batch_dev,
                                  jax.random.PRNGKey(0))
        fetch = lambda m: float(m["diff"])
    else:
        tr = T.Stage3Trainer(cfg)
        teacher = jax.tree.map(jax.numpy.array, params["diffusion"])
        state = tr.init_state(teacher)
        step = lambda s, i: tr.train_step(s, teacher, acoustic, batch_dev,
                                          jax.random.PRNGKey(i))
        low = tr.train_step.lower(tr, state, teacher, acoustic,
                                  batch_dev, jax.random.PRNGKey(0))
        fetch = lambda m: float(m["total_distill"])

    flops = _flops(low.compile())
    state, m = step(state, 0)  # warm (cache-hit compile)
    fetch(m)

    def run(state, i0, k):
        t0 = time.perf_counter()
        m = None
        for j in range(k):
            state, m = step(state, i0 + 1 + j)
        fetch(m)
        return state, time.perf_counter() - t0

    state, t_lo = run(state, 0, k_lo)
    _, t_hi = run(state, k_lo, k_hi)
    dt = (t_hi - t_lo) / (k_hi - k_lo)
    return {"stage": stage, "batch": batch, "n_frames": n_frames,
            "train_step_ms": round(dt * 1e3, 2),
            "xla_cost_analysis_tflop": round(flops / 1e12, 4),
            "tflops_per_s": round(flops / dt / 1e12, 2),
            "mfu_pct_of_bf16_peak": round(100 * flops / dt / PEAK_BF16, 2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=256)
    ap.add_argument("--stages", type=int, nargs="*", default=[1, 2, 3])
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke of the probe itself (tiny config)")
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)
    for s in args.stages:
        print(json.dumps(measure_stage(s, batch=args.batch,
                                       n_frames=args.frames,
                                       tiny=args.tiny)), flush=True)


if __name__ == "__main__":
    main()
