"""Stage-1 train-step wall time: measured kernel routing vs pure XLA.

VERDICT r1 item 5 evidence: the AdaIN-conv dedicated Pallas backward (plus
flash-style attention bwd) must show up as a measured full-train-step
speedup, not just a kernel micro-benchmark.

Timing: chained slope — the train state IS the carry (params evolve every
step, so no dispatch ever repeats input values; donation is satisfied
because each state is consumed once).  Wall time for k_hi steps minus wall
time for k_lo steps, each fenced by fetching one scalar metric.
"""
from __future__ import annotations

import json
import sys
import time

import jax

sys.path.insert(0, ".")

from styletts_zs_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def measure(use_pallas: bool, *, batch: int, n_frames: int,
            k_lo: int = 2, k_hi: int = 8) -> float:
    from styletts_zs_tpu.pipelines import train as T
    from styletts_zs_tpu.pipelines.data import SyntheticDataset
    from styletts_zs_tpu.pipelines.factory import init_params
    from styletts_zs_tpu.utils.config import (Config, ModelConfig,
                                              RuntimeConfig)

    cfg = Config(model=ModelConfig(max_text_len=256, max_frames=n_frames),
                 runtime=RuntimeConfig(compute_dtype="bfloat16",
                                       use_pallas=use_pallas))
    params = init_params(cfg, jax.random.PRNGKey(0), with_discriminator=True)
    trainer = T.Stage1Trainer(cfg)
    state = trainer.init_state(params)
    ds = SyntheticDataset(cfg.model, batch_size=batch, seed=0,
                          n_frames=n_frames)
    batch_dev = T.batch_to_device(ds.next_batch())

    def step(state, i):
        return trainer.train_step(state, batch_dev, jax.random.PRNGKey(i))

    state, m = step(state, 0)  # compile + warm
    float(m["total_g"])

    def run(state, i0, k):
        t0 = time.perf_counter()
        m = None
        for j in range(k):
            state, m = step(state, i0 + 1 + j)
        float(m["total_g"])
        return state, time.perf_counter() - t0

    state, t_lo = run(state, 0, k_lo)
    _, t_hi = run(state, k_lo, k_hi)
    return (t_hi - t_lo) / (k_hi - k_lo)


def main():
    print("backend:", jax.default_backend(), flush=True)
    # 256-frame training clips, as the real pipelines use (cli train /
    # train_pipeline cap clips at 256 frames; 1024-frame clips OOM HBM in
    # the stage-1 GAN step's discriminator convs)
    batch, n_frames = 8, 256
    res = {}
    for up in (True, False):
        dt = measure(up, batch=batch, n_frames=n_frames)
        res["pallas" if up else "xla"] = dt
        print(json.dumps({"routing": "measured-pallas" if up else "pure-xla",
                          "batch": batch, "n_frames": n_frames,
                          "train_step_ms": round(dt * 1e3, 2)}), flush=True)
    print(json.dumps({"speedup_pallas_routing":
                      round(res["xla"] / res["pallas"], 3)}), flush=True)


if __name__ == "__main__":
    main()
