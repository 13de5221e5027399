"""Bound the bf16/Pallas numeric drift vs the fp32 XLA golden (VERDICT r2
item 3 / r3 item 8; obligation ``BASELINE.json:5`` "mel/waveform allclose
to reference" — previously proven at fp32 only).

Per frame length, masked mel MAE (and wav MAE) of the batch-1 fused
synthesis program against the fp32 no-Pallas golden, decomposed by variant:

  prod        bf16 + Pallas routing      (what bench.py / serving run)
  bf16_xla    bf16, no Pallas            isolates dtype drift
  fp32_pallas fp32 + Pallas routing      isolates kernel drift

so ``prod ~ bf16_xla`` means the drift is bf16 accumulation (length-
dependent, expected), while ``prod >> bf16_xla`` would indict a kernel.

    python scripts/probe_bf16_drift.py --frames 256 512 1024 \
        --out docs/artifacts/bf16_drift_r4.json
"""
from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from styletts_zs_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def _args_for(m, batch, seed=0):
    rng = jax.random.PRNGKey(seed)
    Tt = m.max_text_len
    ref_frames = 3 * m.audio.sample_rate // m.audio.hop_length
    return (jax.random.randint(rng, (batch, Tt), 1, 40),
            jnp.full((batch,), Tt, jnp.int32),
            jax.random.normal(rng, (batch, ref_frames, m.audio.n_mels)) * 0.5,
            jnp.full((batch,), ref_frames, jnp.int32),
            jax.random.PRNGKey(0))


def drift_at(n_frames: int, tiny: bool, bundle: str | None = None) -> dict:
    from styletts_zs_tpu.pipelines.factory import init_params
    from styletts_zs_tpu.pipelines.infer import make_synthesis_fn
    from styletts_zs_tpu.utils.config import (Config, ModelConfig,
                                              RuntimeConfig, replace,
                                              tiny_test_config)

    if tiny:
        base = tiny_test_config()
        base = replace(base, model=replace(base.model,
                                           max_frames=min(n_frames, 128)))
    else:
        base = Config(model=ModelConfig(max_text_len=256,
                                        max_frames=n_frames))
    variants = {
        "prod": RuntimeConfig(compute_dtype="bfloat16", use_pallas=True),
        "bf16_xla": RuntimeConfig(compute_dtype="bfloat16", use_pallas=False),
        "fp32_pallas": RuntimeConfig(compute_dtype="float32",
                                     use_pallas=True),
    }
    golden_cfg = replace(base, runtime=RuntimeConfig(
        compute_dtype="float32", use_pallas=False))
    params = init_params(golden_cfg, jax.random.PRNGKey(0))
    if bundle:
        # trained bundle: realistic activations AND a duration predictor
        # that emits nonzero frames (init params can emit 0 -> vacuous MAE)
        from styletts_zs_tpu.pipelines.checkpoint import load_params
        params = load_params(bundle, like={
            k: params[k] for k in ("acoustic", "vocoder", "diffusion")})
    args = _args_for(base.model, 1)

    def run(cfg):
        fn = jax.jit(make_synthesis_fn(cfg, one_step=True, with_vocoder=True,
                                       n_frames=cfg.model.max_frames))
        out, wav = fn(params, *args)
        return (np.asarray(out.mel, np.float32),
                np.asarray(out.frame_mask),
                np.asarray(wav, np.float32))

    mel_g, mask, wav_g = run(golden_cfg)
    m3 = mask[..., None]
    row: dict = {"n_frames": base.model.max_frames,
                 "frames_emitted": int(mask.sum())}
    for name, rt in variants.items():
        mel_v, _, wav_v = run(replace(base, runtime=rt))
        mae = float(np.abs((mel_v - mel_g) * m3).sum()
                    / max(m3.sum() * mel_g.shape[-1], 1))
        row[f"mel_mae_{name}"] = round(mae, 5)
        row[f"wav_mae_{name}"] = round(float(np.abs(wav_v - wav_g).mean()), 6)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, nargs="*", default=[256, 512, 1024])
    ap.add_argument("--out", default="docs/artifacts/bf16_drift_r4.json")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--bundle", default=None,
                    help="trained {acoustic,vocoder,diffusion} dir "
                         "(train_pipeline workdir/final)")
    args = ap.parse_args()
    tiny = args.tiny or jax.default_backend() == "cpu"
    rows = []
    for f in args.frames:
        row = drift_at(f, tiny, args.bundle)
        print(json.dumps(row), flush=True)
        rows.append(row)
    with open(args.out, "w") as fh:
        json.dump({"backend": jax.default_backend(), "rows": rows}, fh,
                  indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
