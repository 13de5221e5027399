"""Device-trace the stage-1 GAN train step and report hlo_category shares.

Attributes the ~1 s/step (batch 8, 256-frame clips) measured by
scripts/probe_trainstep.py.  SURVEY.md §5.1 profiling evidence.
"""
from __future__ import annotations

import collections
import glob
import gzip
import json
import sys

import jax

sys.path.insert(0, ".")

from styletts_zs_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def main():
    from styletts_zs_tpu.pipelines import train as T
    from styletts_zs_tpu.pipelines.data import SyntheticDataset
    from styletts_zs_tpu.pipelines.factory import init_params
    from styletts_zs_tpu.utils import metrics as M
    from styletts_zs_tpu.utils.config import (Config, ModelConfig,
                                              RuntimeConfig)

    cfg = Config(model=ModelConfig(max_text_len=256, max_frames=256),
                 runtime=RuntimeConfig(compute_dtype="bfloat16",
                                       use_pallas=True))
    params = init_params(cfg, jax.random.PRNGKey(0), with_discriminator=True)
    tr = T.Stage1Trainer(cfg)
    state = tr.init_state(params)
    ds = SyntheticDataset(cfg.model, batch_size=8, seed=0, n_frames=256)
    batch = T.batch_to_device(ds.next_batch())
    state, m = tr.train_step(state, batch, jax.random.PRNGKey(0))
    float(m["total_g"])
    with M.profile_trace("/tmp/train_trace"):
        for i in range(2):
            state, m = tr.train_step(state, batch, jax.random.PRNGKey(i + 1))
        float(m["total_g"])

    p = sorted(glob.glob(
        "/tmp/train_trace/plugins/profile/*/*.trace.json.gz"))[-1]
    d = json.loads(gzip.open(p).read())
    evs = d["traceEvents"]
    pn = {e["pid"]: e["args"]["name"] for e in evs
          if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = [k for k, n in pn.items() if "TPU" in n]
    cat = collections.Counter()
    prog = collections.Counter()
    for e in evs:
        if e.get("ph") == "X" and e.get("dur") and e.get("pid") in dev:
            hc = e.get("args", {}).get("hlo_category")
            if hc:
                cat[hc] += e["dur"]
            if e["name"].startswith("jit_"):
                prog[e["name"]] += e["dur"]
    out = {
        "programs_ms_per_step": {k[:80]: round(v / 2e3, 2)
                                 for k, v in prog.most_common(6)},
        "hlo_category_ms_per_step": {k: round(v / 2e3, 2)
                                     for k, v in cat.most_common(14)},
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
