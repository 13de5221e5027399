"""Acceptance-config integration runs (BASELINE.json:6-12 -> JSON reports).

Each of the five driver acceptance configs becomes a runnable entry point
(SURVEY.md §4.2 "the five configs become five integration-test entry
points"):

  1 cpu_ref       mel/wav numerics vs the fp32 golden (pipelines/verify.py)
  2 zs_batch8     3 s prompt encode + 1-step CFG diffusion -> mel, batch 8
  3 multistep_b32 full multi-step sampler (CFG doubled batch), batch 32
  4 longform_60s  decoder + vocoder fused, 60 s chunked attention -> wav
  5 pod_v5e16     length-bucketed serving (scaled to available devices)

Run: python -m styletts_zs_tpu.cli accept --level 2
"""
from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from styletts_zs_tpu.utils import metrics as metrics_lib
from styletts_zs_tpu.utils.config import (Config, ModelConfig, RuntimeConfig,
                                          ServeConfig, replace)


def _measure(fn, args, n_samples: int = 3):
    """Per-call device time via the slope method (``metrics.slope_time``) —
    the only valid TPU timing on this runtime (no-op block_until_ready).

    The trailing PRNG-key argument is re-derived per dispatch: the runtime
    memoizes dispatches by input VALUE, so identical repeated args would
    fake a near-zero slope (CLAUDE.md timing rules).

    Returns (out, median_dt, spread): the slope is sampled ``n_samples``
    times and the MEDIAN reported with the (min, max) spread — the remote
    runtime shows ±15-30% run-to-run variance on ~10 ms programs, so a
    single-shot number is not reproducible (VERDICT r2 weak item 6).
    """
    out = fn(*args)
    on_tpu = jax.default_backend() == "tpu"
    k_lo, k_hi = (2, 8) if on_tpu else (1, 3)
    if not on_tpu:
        n_samples = 1
    dts = sorted(
        metrics_lib.slope_time(
            fn, lambda i: (*args[:-1], jax.random.PRNGKey(1000 * s + i)),
            k_lo=k_lo, k_hi=k_hi)
        for s in range(n_samples))
    return out, dts[len(dts) // 2], (dts[0], dts[-1])


def _synth_report(cfg: Config, *, batch: int, one_step: bool,
                  n_steps: Optional[int], with_vocoder: bool,
                  n_frames: int) -> dict:
    from styletts_zs_tpu.pipelines.factory import init_params
    from styletts_zs_tpu.pipelines.infer import make_synthesis_fn

    m = cfg.model
    params = init_params(cfg, jax.random.PRNGKey(0))
    fn = jax.jit(make_synthesis_fn(cfg, one_step=one_step, n_steps=n_steps,
                                   with_vocoder=with_vocoder,
                                   n_frames=n_frames))
    rng = jax.random.PRNGKey(0)
    Tt = m.max_text_len
    ref_frames = 3 * m.audio.sample_rate // m.audio.hop_length
    args = (params,
            jax.random.randint(rng, (batch, Tt), 1, 40),
            jnp.full((batch,), Tt, jnp.int32),
            jax.random.normal(rng, (batch, ref_frames, m.audio.n_mels)) * 0.5,
            jnp.full((batch,), ref_frames, jnp.int32),
            rng)
    (out, wav), dt, spread = _measure(fn, args)
    audio_s = (batch * (wav.shape[1] / m.audio.sample_rate) if wav is not None
               else batch * n_frames * m.audio.hop_length / m.audio.sample_rate)
    rep = {
        "batch": batch, "n_frames": n_frames,
        "one_step": one_step, "with_vocoder": with_vocoder,
        "wall_s_per_call": round(dt, 4),
        "wall_s_per_call_spread": [round(spread[0], 4), round(spread[1], 4)],
        "audio_s_per_s": round(audio_s / dt, 2),
        "rtf_target_10x": round(audio_s / dt / 10.0, 3),
        "mel_finite": bool(np.isfinite(np.asarray(out.mel)).all()),
    }
    if wav is not None:
        rep["wav_finite"] = bool(np.isfinite(np.asarray(wav)).all())
    return rep


def run_acceptance(level: int, *, full_size: Optional[bool] = None,
                   n_requests: Optional[int] = None,
                   use_mesh: bool = False,
                   bundle: Optional[str] = None) -> dict:
    """Run acceptance config ``level`` (1-5); returns a JSON-able report.

    ``n_requests`` / ``use_mesh`` / ``bundle`` apply to level 5 only:
    request count override (contract scale is 4096, ``BASELINE.json:11``),
    data-parallel dispatch over ``mesh.make_mesh()`` (all visible devices),
    and a trained-bundle checkpoint dir ({acoustic, vocoder, diffusion},
    e.g. a ``train_pipeline`` workdir's ``final/``) so the served frames —
    and therefore the throughput stat — are real rather than the ~0-frame
    output of an untrained duration predictor (VERDICT r3 weak item 7).
    """
    on_tpu = jax.default_backend() == "tpu"
    full = on_tpu if full_size is None else full_size

    if level == 1:
        from styletts_zs_tpu.pipelines.verify import run_verification
        rep = run_verification(max_frames=256 if full else 64, batch=1)
        rep["config"] = "cpu_ref"
        return rep

    if full:
        base = Config(model=ModelConfig(max_text_len=256, max_frames=1024),
                      runtime=RuntimeConfig(compute_dtype="bfloat16",
                                            use_pallas=True))
    else:
        from styletts_zs_tpu.utils.config import tiny_test_config
        base = tiny_test_config()

    if level == 2:
        rep = _synth_report(base, batch=8, one_step=True, n_steps=None,
                            with_vocoder=False,
                            n_frames=base.model.max_frames)
        rep["config"] = "zs_batch8"
        return rep

    if level == 3:
        rep = _synth_report(base, batch=32 if full else 4, one_step=False,
                            n_steps=16 if full else 4, with_vocoder=False,
                            n_frames=base.model.max_frames)
        rep["config"] = "multistep_b32"
        return rep

    if level == 4:
        frames = 4864 if full else 128
        cfg = replace(base, model=replace(base.model, max_frames=frames))
        rep = _synth_report(cfg, batch=4 if full else 2, one_step=True,
                            n_steps=None, with_vocoder=True, n_frames=frames)
        rep["config"] = "longform_60s"
        return rep

    if level == 5:
        from styletts_zs_tpu.parallel import bucketing, mesh as mesh_lib
        from styletts_zs_tpu.pipelines.factory import init_params
        from styletts_zs_tpu.pipelines.serve import Request, Server
        from styletts_zs_tpu.utils import text as text_utils

        # Contract scale is a 4096-utterance mixed-speaker batch
        # (BASELINE.json:11); default stays modest on the single real chip
        # (the RPC tunnel makes 4096 waveform fetches transfer-bound, not a
        # chip-throughput statement) — `cli accept --level 5 --requests 4096`
        # runs the full contract count (virtual-mesh CPU run in tests).
        n_req = n_requests or (256 if full else 8)
        # mesh dispatch shards the batch over the data axis, so the batch
        # must divide evenly across it (static-shape contract)
        serve = ServeConfig(batch_size=32 if full else (16 if use_mesh else 2),
                            one_step=True, with_vocoder=False,
                            frame_buckets=(256, 512, 1024) if full
                            else (64, 128))
        cfg = replace(base, serve=serve)
        params = init_params(cfg, jax.random.PRNGKey(0))
        mesh = mesh_lib.make_mesh() if use_mesh else None
        if bundle is not None:
            from styletts_zs_tpu.pipelines.checkpoint import load_params
            trained = load_params(bundle, like={
                k: params[k] for k in ("acoustic", "vocoder", "diffusion")})
            params = {**params, **trained}
            if mesh is not None:
                # orbax restores COMMITTED single-device arrays; replicate
                # them over the mesh or the sharded-batch dispatch rejects
                # the device mismatch (init params are uncommitted and
                # auto-place, which is why the untrained path never hit it)
                from jax.sharding import NamedSharding, PartitionSpec
                params = jax.device_put(
                    params, NamedSharding(mesh, PartitionSpec()))
        server = Server(cfg, params, mesh=mesh)
        rng = np.random.default_rng(0)
        sr = cfg.model.audio.sample_rate
        reqs = [Request(
            uid=i,
            phonemes=np.asarray(text_utils.text_to_ids("some request text"),
                                np.int32),
            ref_wav=rng.standard_normal(3 * sr).astype(np.float32) * 0.1,
            est_frames=int(rng.integers(32, cfg.model.max_frames)))
            for i in range(n_req)]
        # serve_batch truncates to serve.max_global_batch — plan over the
        # same slice or the parity flag below reads false spuriously for
        # --requests > max_global_batch (ADVICE r3)
        reqs = reqs[: serve.max_global_batch]
        plan = server.plan(reqs)
        t0 = time.perf_counter()
        results = server.serve_batch(reqs)
        dt = time.perf_counter() - t0
        audio_s = sum(r.frames for r in results) * cfg.model.audio.hop_length / sr
        # per-bucket dispatch counts must match the collective-derived plan
        # (bucket by the request's length ESTIMATE — what the plan saw)
        est_by_uid = {r.uid: r.est_frames for r in reqs}
        got = {b: 0 for b in plan.batches_per_bucket}
        for r in results:
            b = bucketing.bucket_for(est_by_uid[r.uid], serve.frame_buckets)
            got[b] = got.get(b, 0) + 1
        batches_served = {
            b: -(-n // serve.batch_size) for b, n in got.items() if n}
        return {"config": "pod_serving", "n_requests": len(reqs),
                "completed": len(results), "requeued": len(server.requeued),
                "mesh": str(dict(mesh.shape)) if mesh is not None else None,
                "bundle": bundle,
                "plan_batches": dict(sorted(
                    plan.batches_per_bucket.items())),
                "served_batches": dict(sorted(batches_served.items())),
                # requeued batches are absent from `got` by design, so the
                # parity check is only meaningful when nothing requeued
                # (ADVICE r3): None = N/A, not a pass
                "plan_matches_served":
                    (batches_served == plan.batches_per_bucket)
                    if not server.requeued else None,
                "style_table_shape": list(server.last_style_table.shape),
                "wall_s": round(dt, 2),
                "audio_s_per_s_incl_compile": round(audio_s / dt, 2)}

    raise ValueError(f"unknown acceptance level {level}")
