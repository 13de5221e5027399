"""Re-measure the final zero-shot speaker-similarity margin on a bundle.

The falsifiable A1/A6 gate (``pipelines/eval.speaker_similarity_margin``)
over the SAME held-out batch the training pipeline gates on, through the
full production path: text + 3s reference prompt -> 1-step distilled style
sample -> lattice projection -> decode -> vocoder -> wav -> prompt-encoder
embedding.  Lets the gate re-run standalone after inference-path fixes
(r5: the quantizer round-trip fix) without repeating training.

    python scripts/eval_final_margin.py --workdir runs/r5 \
        --out docs/artifacts/final_margin_r5.json

Robustness mode (``--seeds S --batch-seeds B``): the headline margin is a
single (sampling seed, held-out batch) draw; this re-reads the gate over S
diffusion sampling seeds on each of B independently drawn held-out speaker
sets (SyntheticDataset seed offsets — every batch is 16 NEVER-seen
speakers, so each is a genuine zero-shot trial) and reports the per-run
margins plus mean/min aggregates.  One compile either way — rng and batch
are array arguments.
"""
from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="runs/r5")
    ap.add_argument("--out", default="docs/artifacts/final_margin_r5.json")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--seeds", type=int, default=1,
                    help="number of diffusion sampling seeds per batch")
    ap.add_argument("--batch-seeds", type=int, default=1,
                    help="number of independent held-out speaker sets")
    args = ap.parse_args()

    from styletts_zs_tpu.pipelines import eval as E
    from styletts_zs_tpu.pipelines.checkpoint import load_params
    from styletts_zs_tpu.pipelines.data import SyntheticDataset
    from styletts_zs_tpu.pipelines.factory import init_params
    from styletts_zs_tpu.pipelines.infer import Synthesizer
    from styletts_zs_tpu.utils.cache import enable_compilation_cache
    from styletts_zs_tpu.utils.config import Config, tiny_test_config

    enable_compilation_cache()
    cfg = tiny_test_config() if args.tiny else Config()
    like = init_params(cfg, jax.random.PRNGKey(0))
    bundle = load_params(f"{args.workdir}/final", like={
        k: like[k] for k in ("acoustic", "vocoder", "diffusion")})
    n_frames = min(cfg.model.max_frames, 128 if args.tiny else 256)
    syn = Synthesizer(cfg, bundle)

    runs = []
    for b in range(args.batch_seeds):
        # seed+10_000 is THE training-pipeline gate batch (b=0 reproduces
        # the committed headline number); b>0 draws fresh held-out speakers
        eval_batch = SyntheticDataset(
            cfg.model, batch_size=cfg.train.batch_size,
            seed=cfg.train.seed + 10_000 + 1000 * b,
            n_frames=n_frames).next_batch()
        for s in range(args.seeds):
            out, wav = syn.synthesize(
                jnp.asarray(eval_batch.phonemes),
                jnp.asarray(eval_batch.ref_wav),
                text_lengths=jnp.asarray(eval_batch.text_lengths),
                n_frames=n_frames, rng=jax.random.PRNGKey(s))
            margin = E.speaker_similarity_margin(
                cfg, bundle["acoustic"], wav,
                jnp.asarray(eval_batch.ref_wav))
            runs.append({"batch_seed": b, "sample_seed": s,
                         **{k: round(v, 4) if isinstance(v, float) else v
                            for k, v in margin.items()}})
            print(json.dumps(runs[-1]), flush=True)

    margins = [r["sim_margin"] for r in runs]
    accs = [r["retrieval_acc"] for r in runs]
    res = {"workdir": args.workdir,
           "batch": int(wav.shape[0]),
           "synthesis_shape": str(wav.shape),
           "n_runs": len(runs),
           "sim_margin_mean": round(sum(margins) / len(margins), 4),
           "sim_margin_min": round(min(margins), 4),
           "retrieval_acc_mean": round(sum(accs) / len(accs), 4),
           "retrieval_acc_min": round(min(accs), 4),
           "retrieval_chance": runs[0].get("retrieval_chance"),
           **{k: v for k, v in runs[0].items()
              if k not in ("batch_seed", "sample_seed")},
           "runs": runs}
    print(json.dumps(res, indent=1))
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
