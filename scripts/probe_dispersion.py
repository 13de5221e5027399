"""Separate CFG sharpening from real sampler collapse (VERDICT r4 item 4).

Run A's stage-2 dispersion gate read ``style_mse_ratio_pairs_over_gt`` =
0.70-0.86 at every gate vs the target 2 — but the gate sampled at the
serving guidance (cfg_scale 3.0), and classifier-free guidance *by design*
sharpens the sampled distribution (it samples ~ p(x|c)·p(c|x)^{g-1}, whose
variance shrinks with g).  A ratio ≪ 2 at g=3 therefore cannot distinguish
"the model under-disperses" from "CFG is doing its job".

This probe sweeps guidance on a trained teacher (default: run A's surviving
``runs/r4/stage2`` EMA bundle) with a multi-seed gate at each point:

  - g = 1.0 is the pure conditional: if the ratio ≈ 2 there, the sampler
    matches the true conditional and the GATE was mis-specified (fix: gate
    dispersion at g=1, quality at serving g);
  - if the ratio is still ≪ 2 at g=1, the model itself is collapsed →
    training-side fixes (cond_dropout, sigma distribution) are on the hook.

Also reports ``mel_mae_sampled_vs_gt_style`` per g — the companion gate
(target ≤ 0.15) that was rising with training at g=3.

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/probe_dispersion.py \
        --workdir runs/r4 --out docs/artifacts/dispersion_sweep_r5.json
"""
from __future__ import annotations

import argparse
import json
import sys

import jax

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="runs/r4")
    ap.add_argument("--out", default="docs/artifacts/dispersion_sweep_r5.json")
    ap.add_argument("--guidance", type=float, nargs="*",
                    default=[1.0, 1.5, 2.0, 3.0])
    ap.add_argument("--seeds", type=int, default=4)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    from styletts_zs_tpu.pipelines import eval as E
    from styletts_zs_tpu.pipelines.checkpoint import load_params
    from styletts_zs_tpu.pipelines.data import SyntheticDataset
    from styletts_zs_tpu.pipelines.factory import init_params
    from styletts_zs_tpu.utils.cache import enable_compilation_cache
    from styletts_zs_tpu.utils.config import Config, tiny_test_config

    enable_compilation_cache()
    cfg = tiny_test_config() if args.tiny else Config()
    like = init_params(cfg, jax.random.PRNGKey(0))
    p_ac = load_params(f"{args.workdir}/stage1",
                       like={"acoustic": like["acoustic"],
                             "vocoder": like["vocoder"]})["acoustic"]
    p_teacher = load_params(f"{args.workdir}/stage2", like=like["diffusion"])

    n_frames = min(cfg.model.max_frames, 128 if args.tiny else 256)
    # the SAME held-out batch the quality gates use
    batch = SyntheticDataset(cfg.model, batch_size=cfg.train.batch_size,
                             seed=cfg.train.seed + 10_000,
                             n_frames=n_frames).next_batch()

    # ---- irreducible floors the gates must be read against ------------
    # The decoded-mel gate compares decode(sampled style) vs decode(GT
    # style).  But a PERFECT sampler draws a different valid style than the
    # target utterance's, so the gate's floor is the mel MAE between decodes
    # of two ground-truth styles of the SAME speaker (target utterance vs
    # its reference utterance) — not 0.  Likewise the latent-space spread
    # E|gt_a - gt_b|^2 calibrates the pairwise-ratio denominator.
    import jax.numpy as jnp
    from styletts_zs_tpu.models.tts import StyleTTSZS
    from styletts_zs_tpu.ops import stft as stft_ops
    from styletts_zs_tpu.ops.attention import length_mask
    from styletts_zs_tpu.pipelines.eval import mel_mae
    from styletts_zs_tpu.pipelines.factory import build_models
    acoustic, _, _, _ = build_models(cfg)
    m = cfg.model
    phonemes = jnp.asarray(batch.phonemes)
    text_mask = length_mask(jnp.asarray(batch.text_lengths),
                            phonemes.shape[1])
    frame_mask = length_mask(jnp.asarray(batch.frame_lengths), n_frames)
    mel_gt = stft_ops.mel_spectrogram(jnp.asarray(batch.wav),
                                      m.audio)[:, :n_frames]
    ref_mel = stft_ops.mel_spectrogram(jnp.asarray(batch.ref_wav), m.audio)
    styled_gt, _, _ = acoustic.apply(p_ac, mel_gt, frame_mask,
                                     method=StyleTTSZS.extract_style)
    ref_mask = jnp.ones(ref_mel.shape[:2], bool)
    styled_ref, _, _ = acoustic.apply(p_ac, ref_mel, ref_mask,
                                      method=StyleTTSZS.extract_style)

    def decode(s):
        q = acoustic.apply(p_ac, s, method=StyleTTSZS.quantize_style)
        return acoustic.apply(p_ac, phonemes, q, text_mask=text_mask,
                              durations=jnp.asarray(batch.durations),
                              n_frames=n_frames,
                              method=StyleTTSZS.text_to_mel)
    d_gt, d_ref = decode(styled_gt), decode(styled_ref)
    floors = {
        "gt_within_speaker_latent_mse": round(float(jnp.mean(
            (styled_gt.astype(jnp.float32)
             - styled_ref.astype(jnp.float32)) ** 2)), 5),
        "style_swap_floor_mel_mae": round(mel_mae(
            d_ref.mel, d_gt.mel, d_gt.frame_mask & d_ref.frame_mask), 5),
    }
    print(json.dumps(floors), flush=True)

    out = {"workdir": args.workdir, "n_seeds": args.seeds, **floors,
           "sweep": []}
    rng = jax.random.PRNGKey(1234)
    for g in args.guidance:
        rng, sub = jax.random.split(rng)
        res = E.evaluate_diffusion(cfg, p_ac, p_teacher, batch, sub,
                                   n_seeds=args.seeds, guidance=g)
        row = {"guidance": g, **res}
        print(json.dumps(row), flush=True)
        out["sweep"].append(row)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
