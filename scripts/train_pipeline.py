"""Full 3-stage training pipeline: GAN -> diffusion -> distillation.

Demonstrates the stage handoffs of SURVEY.md §3.3-3.5 end to end on the
synthetic corpus (offline box): stage-1 EMA params freeze into stage 2's
encoders; stage-2 EMA becomes stage 3's teacher; the distilled student plus
the stage-1 acoustic/vocoder params form the final serving bundle.

    python scripts/train_pipeline.py --steps1 200 --steps2 200 --steps3 50 \
        --workdir /tmp/styletts_run [--tiny]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import jax

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps1", type=int, default=200)
    ap.add_argument("--steps2", type=int, default=200)
    ap.add_argument("--steps3", type=int, default=50)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--workdir", default="/tmp/styletts_run")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--eval-every", type=int, default=50)
    args = ap.parse_args()

    from styletts_zs_tpu.pipelines import train as T
    from styletts_zs_tpu.pipelines import eval as E
    from styletts_zs_tpu.pipelines.checkpoint import save_params
    from styletts_zs_tpu.pipelines.data import SyntheticDataset
    from styletts_zs_tpu.pipelines.eval import speaker_similarity
    from styletts_zs_tpu.pipelines.factory import init_params
    from styletts_zs_tpu.pipelines.infer import Synthesizer
    from styletts_zs_tpu.utils.cache import enable_compilation_cache
    from styletts_zs_tpu.utils.config import (Config, replace,
                                              tiny_test_config)
    enable_compilation_cache()

    cfg = tiny_test_config() if args.tiny or jax.default_backend() == "cpu" \
        else Config()
    if args.batch:
        cfg = replace(cfg, train=replace(cfg.train, batch_size=args.batch))
    n_frames = min(cfg.model.max_frames, 128 if args.tiny else 256)

    params = init_params(cfg, jax.random.PRNGKey(cfg.train.seed),
                         with_discriminator=True)
    ds = SyntheticDataset(cfg.model, batch_size=cfg.train.batch_size,
                          seed=cfg.train.seed, n_frames=n_frames)
    # held-out utterances (disjoint seed -> disjoint synthetic speakers/texts)
    # for the stage-boundary quality gates (VERDICT r1 item 8)
    eval_batch = SyntheticDataset(
        cfg.model, batch_size=cfg.train.batch_size,
        seed=cfg.train.seed + 10_000, n_frames=n_frames).next_batch()
    quality: dict = {"config": "tiny" if args.tiny else "full",
                     "held_out_batch": cfg.train.batch_size,
                     "steps": [args.steps1, args.steps2, args.steps3]}
    rng = jax.random.PRNGKey(cfg.train.seed)

    def log(stage, step, metrics):
        m = {k: round(float(v), 4) for k, v in metrics.items()}
        print(json.dumps({"stage": stage, "step": step, **m}), flush=True)

    # ---- stage 1: adversarial acoustic autoencoder --------------------
    t0 = time.time()
    tr1 = T.Stage1Trainer(cfg)
    s1 = tr1.init_state(params)
    for step in range(args.steps1):
        batch = T.batch_to_device(ds.next_batch())
        rng, sub = jax.random.split(rng)
        s1, metrics = tr1.train_step(s1, batch, sub)
        if step % args.eval_every == 0:
            log("1", step, metrics)
    acoustic_final = s1.ema_params
    save_params(f"{args.workdir}/stage1", acoustic_final)
    quality["stage1"] = E.evaluate_acoustic(cfg, acoustic_final, eval_batch)
    print(json.dumps({"quality_gate": "stage1", **quality["stage1"]}),
          flush=True)
    print(f"stage 1 done in {time.time()-t0:.0f}s", flush=True)

    # ---- stage 2: style latent diffusion ------------------------------
    t0 = time.time()
    tr2 = T.Stage2Trainer(cfg)
    s2 = tr2.init_state(params["diffusion"])
    for step in range(args.steps2):
        batch = T.batch_to_device(ds.next_batch())
        rng, sub = jax.random.split(rng)
        s2, metrics = tr2.train_step(s2, acoustic_final["acoustic"], batch,
                                     sub)
        if step % args.eval_every == 0:
            log("2", step, metrics)
    teacher = s2["ema"]
    save_params(f"{args.workdir}/stage2", teacher)
    rng, sub = jax.random.split(rng)
    quality["stage2"] = E.evaluate_diffusion(
        cfg, acoustic_final["acoustic"], teacher, eval_batch, sub)
    print(json.dumps({"quality_gate": "stage2", **quality["stage2"]}),
          flush=True)
    print(f"stage 2 done in {time.time()-t0:.0f}s", flush=True)

    # ---- stage 3: 1-step distillation (A7: ~10k samples) --------------
    t0 = time.time()
    tr3 = T.Stage3Trainer(cfg)
    s3 = tr3.init_state(teacher)
    n3 = min(args.steps3, cfg.train.distill_samples // cfg.train.batch_size)
    for step in range(n3):
        batch = T.batch_to_device(ds.next_batch())
        rng, sub = jax.random.split(rng)
        s3, metrics = tr3.train_step(s3, teacher, acoustic_final["acoustic"],
                                     batch, sub)
        if step % args.eval_every == 0:
            log("3", step, metrics)
    rng, sub = jax.random.split(rng)
    quality["stage3"] = E.evaluate_distill_gap(
        cfg, acoustic_final["acoustic"], teacher, s3["params"], eval_batch,
        sub)
    print(json.dumps({"quality_gate": "stage3", **quality["stage3"]}),
          flush=True)
    print(f"stage 3 done in {time.time()-t0:.0f}s", flush=True)

    # ---- final bundle + smoke synthesis ------------------------------
    bundle = {"acoustic": acoustic_final["acoustic"],
              "vocoder": acoustic_final["vocoder"],
              "diffusion": s3["params"]}
    save_params(f"{args.workdir}/final", bundle)

    syn = Synthesizer(cfg, bundle)
    batch = ds.next_batch()
    import jax.numpy as jnp
    out, wav = syn.synthesize(
        jnp.asarray(batch.phonemes[:2]), jnp.asarray(batch.ref_wav[:2]),
        text_lengths=jnp.asarray(batch.text_lengths[:2]),
        n_frames=n_frames)
    sim = speaker_similarity(cfg, bundle["acoustic"], wav,
                             jnp.asarray(batch.ref_wav[:2, : wav.shape[1]]))
    quality["final"] = {
        "synthesis_shape": str(wav.shape),
        "speaker_sim_proxy": [round(float(s), 3) for s in sim],
    }
    report_path = f"{args.workdir}/quality_report.json"
    with open(report_path, "w") as f:
        json.dump(quality, f, indent=1)
    print(json.dumps({"final_synthesis": str(wav.shape),
                      "speaker_sim_proxy": [round(float(s), 3) for s in sim]}),
          flush=True)
    print("pipeline complete; bundle at", f"{args.workdir}/final; "
          f"quality report at {report_path}")


if __name__ == "__main__":
    main()
