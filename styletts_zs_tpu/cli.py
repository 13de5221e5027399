"""Command-line interface: synth / train / bench / verify.

Entry points for the five acceptance configs (``configs/*.toml``,
BASELINE.json:6-12).  Examples:

    python -m styletts_zs_tpu.cli synth --config configs/cpu_ref.toml \
        --text "hello world" --out mel.npy
    python -m styletts_zs_tpu.cli train --stage 1 --steps 100
    python -m styletts_zs_tpu.cli verify          # CPU-vs-backend mel MAE gate
    python -m styletts_zs_tpu.cli bench --config configs/zs_batch8.toml
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _load_cfg(path):
    from styletts_zs_tpu.utils.config import Config, load_config
    return load_config(path) if path else Config()


def _get_params(cfg, ckpt, *, with_discriminator=False):
    import jax
    from styletts_zs_tpu.pipelines.checkpoint import load_params
    from styletts_zs_tpu.pipelines.factory import init_params
    params = init_params(cfg, jax.random.PRNGKey(cfg.train.seed),
                         with_discriminator=with_discriminator)
    if ckpt:
        params = load_params(ckpt, like=params)
    return params


def cmd_synth(args):
    import jax
    import jax.numpy as jnp
    from styletts_zs_tpu.pipelines.infer import Synthesizer
    from styletts_zs_tpu.utils import text as text_utils

    cfg = _load_cfg(args.config)
    params = _get_params(cfg, args.ckpt)
    syn = Synthesizer(cfg, params)

    ids = text_utils.pad_ids(text_utils.text_to_ids(args.text),
                             cfg.model.max_text_len)
    phonemes = jnp.asarray([ids] * cfg.serve.batch_size, jnp.int32)
    tlen = jnp.full((cfg.serve.batch_size,),
                    min(len(text_utils.text_to_ids(args.text)),
                        cfg.model.max_text_len), jnp.int32)

    t0 = time.time()
    if args.fixed_style:
        style = jnp.zeros((phonemes.shape[0], cfg.model.style.n_codes,
                           cfg.model.style.d_style))
        out = syn.synthesize_fixed_style(phonemes, style, text_lengths=tlen)
        wav = None
    else:
        if args.ref:
            from styletts_zs_tpu.pipelines.corpus import read_wav, resample
            from styletts_zs_tpu.pipelines.preprocess import ref_window
            ref, sr = read_wav(args.ref)
            ref = resample(ref, sr, cfg.model.audio.sample_rate)
            ref = ref_window(ref, cfg.model.audio.sample_rate)
            ref = np.tile(ref[None], (cfg.serve.batch_size, 1))
        else:
            ref = np.random.default_rng(0).standard_normal(
                (cfg.serve.batch_size, 3 * cfg.model.audio.sample_rate)
            ).astype(np.float32) * 0.1
        out, wav = syn.synthesize(
            phonemes, jnp.asarray(ref), text_lengths=tlen,
            one_step=cfg.serve.one_step, n_steps=cfg.serve.n_steps,
            guidance=cfg.serve.guidance, with_vocoder=cfg.serve.with_vocoder)
    jax.block_until_ready(out.mel)
    print(f"synthesized mel {out.mel.shape} in {time.time()-t0:.2f}s "
          f"(incl. compile)")

    np.save(args.out, np.asarray(out.mel[0]))
    print(f"wrote {args.out}")
    if wav is not None and args.wav_out:
        import scipy.io.wavfile as wavfile
        w = np.clip(np.asarray(wav[0]), -1.0, 1.0)
        wavfile.write(args.wav_out, cfg.model.audio.sample_rate,
                      (w * 32767).astype(np.int16))
        print(f"wrote {args.wav_out}")


def cmd_train(args):
    import jax
    from styletts_zs_tpu.pipelines import train as T
    from styletts_zs_tpu.pipelines.checkpoint import CheckpointManager, save_params
    from styletts_zs_tpu.pipelines.data import SyntheticDataset
    from styletts_zs_tpu.utils.config import replace

    cfg = _load_cfg(args.config)
    if args.steps:
        cfg = replace(cfg, train=replace(cfg.train, n_steps=args.steps))
    params = _get_params(cfg, args.ckpt, with_discriminator=(args.stage == 1))
    if args.corpus:
        from styletts_zs_tpu.pipelines.corpus import make_corpus_loader
        loader = iter(make_corpus_loader(
            args.corpus, cfg.model, batch_size=cfg.train.batch_size,
            n_frames=min(cfg.model.max_frames, 256), seed=cfg.train.seed))
        next_batch = lambda: next(loader)  # noqa: E731
    else:
        ds = SyntheticDataset(cfg.model, batch_size=cfg.train.batch_size,
                              seed=cfg.train.seed,
                              n_frames=min(cfg.model.max_frames, 256))
        next_batch = ds.next_batch
    mgr = CheckpointManager(args.workdir, keep=cfg.train.keep_checkpoints)
    rng = jax.random.PRNGKey(cfg.train.seed)

    if args.stage == 1:
        tr = T.Stage1Trainer(cfg)
        state = tr.init_state(params)
        for step in range(cfg.train.n_steps):
            batch = T.batch_to_device(next_batch())
            rng, sub = jax.random.split(rng)
            state, metrics = tr.train_step(state, batch, sub)
            if step % cfg.train.log_every == 0:
                m = {k: round(float(v), 4) for k, v in metrics.items()}
                print(f"step {step}: {json.dumps(m)}")
            if step and step % cfg.train.checkpoint_every == 0:
                mgr.save(step, {"g": state.g_params, "d": state.d_params})
        save_params(f"{args.workdir}/stage1_final",
                    {"g": state.ema_params, "d": state.d_params})
    elif args.stage == 2:
        tr = T.Stage2Trainer(cfg)
        state = tr.init_state(params["diffusion"])
        for step in range(cfg.train.n_steps):
            batch = T.batch_to_device(next_batch())
            rng, sub = jax.random.split(rng)
            state, metrics = tr.train_step(state, params["acoustic"], batch, sub)
            if step % cfg.train.log_every == 0:
                print(f"step {step}: diff={float(metrics['diff']):.4f}")
        save_params(f"{args.workdir}/stage2_final", state["ema"])
    else:
        tr = T.Stage3Trainer(cfg)
        state = tr.init_state(params["diffusion"])
        # A7: distillation uses only ~10k samples
        n_steps = min(cfg.train.n_steps,
                      cfg.train.distill_samples // cfg.train.batch_size)
        for step in range(n_steps):
            batch = T.batch_to_device(next_batch())
            rng, sub = jax.random.split(rng)
            state, metrics = tr.train_step(state, params["diffusion"],
                                           params["acoustic"], batch, sub)
            if step % cfg.train.log_every == 0:
                print(f"step {step}: latent={float(metrics['latent']):.4f} "
                      f"perc={float(metrics['perceptual']):.4f}")
        save_params(f"{args.workdir}/stage3_student", state["params"])
    mgr.close()
    print("training done")


def cmd_verify(args):
    """Numerics gate: current-backend output vs CPU golden (BASELINE.json:5,7)."""
    from styletts_zs_tpu.pipelines.verify import run_verification
    report = run_verification(max_frames=args.frames, batch=args.batch)
    print(json.dumps(report, indent=2))


def cmd_accept(args):
    """Run one (or all) of the five acceptance configs (BASELINE.json:6-12)."""
    from styletts_zs_tpu.pipelines.acceptance import run_acceptance
    from styletts_zs_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    if args.level == 0:  # --level 0 = all five, one aggregated JSON report
        report = {f"level_{lv}": run_acceptance(lv,
                                                full_size=args.full or None)
                  for lv in (1, 2, 3, 4, 5)}
    else:
        report = run_acceptance(args.level, full_size=args.full or None,
                                n_requests=args.requests,
                                use_mesh=args.mesh, bundle=args.bundle)
    print(json.dumps(report, indent=2))


def cmd_bench(args):
    import bench
    bench.main()


def main():
    p = argparse.ArgumentParser(prog="styletts_zs_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("synth", help="text (+ reference audio) -> mel/wav")
    ps.add_argument("--config", default=None)
    ps.add_argument("--ckpt", default=None)
    ps.add_argument("--text", required=True)
    ps.add_argument("--ref", default=None, help="reference speaker wav")
    ps.add_argument("--out", default="mel.npy")
    ps.add_argument("--wav-out", default=None)
    ps.add_argument("--fixed-style", action="store_true",
                    help="acceptance config 1: no diffusion, zero style")
    ps.set_defaults(fn=cmd_synth)

    pt = sub.add_parser("train", help="train one stage on synthetic data")
    pt.add_argument("--config", default=None)
    pt.add_argument("--ckpt", default=None)
    pt.add_argument("--stage", type=int, choices=(1, 2, 3), required=True)
    pt.add_argument("--steps", type=int, default=None)
    pt.add_argument("--workdir", default="/tmp/styletts_zs_ckpt")
    pt.add_argument("--corpus", default=None,
                    help="on-disk corpus root (pipelines/corpus.py layout); "
                         "default: synthetic data")
    pt.set_defaults(fn=cmd_train)

    pv = sub.add_parser("verify", help="TPU-vs-CPU-golden numerics gate")
    pv.add_argument("--frames", type=int, default=256)
    pv.add_argument("--batch", type=int, default=1)
    pv.set_defaults(fn=cmd_verify)

    pa = sub.add_parser("accept", help="run an acceptance config (1-5)")
    pa.add_argument("--level", type=int, choices=(0, 1, 2, 3, 4, 5),
                    required=True, help="1-5, or 0 for all five aggregated")
    pa.add_argument("--full", action="store_true",
                    help="force full-size model (default: full on TPU)")
    pa.add_argument("--requests", type=int, default=None,
                    help="level 5: request count (contract scale 4096)")
    pa.add_argument("--mesh", action="store_true",
                    help="level 5: data-parallel dispatch over all devices")
    pa.add_argument("--bundle", default=None,
                    help="level 5: trained bundle dir (train_pipeline "
                         "workdir/final) so served frames are real")
    pa.set_defaults(fn=cmd_accept)

    pb = sub.add_parser("bench", help="throughput benchmark (one JSON line)")
    pb.add_argument("--config", default=None)
    pb.set_defaults(fn=cmd_bench)

    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
