"""The FSQ round-trip bug behind four rounds of failed synth-side margin.

``extract_style`` returns ``up(codes)`` — a point on the lattice's image
under the (trained) ``up`` projection.  ``quantize_style`` re-projects
through ``down`` — but nothing ever trains ``down ∘ up ≈ identity`` (down
only ever sees style-extractor outputs), so re-quantizing an
already-quantized style (or a diffusion sample, which by construction lies
NEAR the up-image it was trained to model) lands on unrelated codes and
scrambles the style.  This is why the r5 decoder preserves speaker identity
perfectly from ``styled_gt`` (identity_carrier_r5.json: retrieval 1.0 for
every prosody variant) while anything passed through ``quantize_style``
retrieves at chance.

The fix needs no retraining: invert ``up`` by least squares.  For
``s = up(codes)``, ``z* = (s - b) @ pinv(W)`` recovers ``codes`` exactly
(W is full rank 6), so the projection is idempotent on lattice images; for
a continuous diffusion sample it snaps to the nearest lattice point in the
least-squares sense.  This probe quantifies all of it on a trained bundle:

  - code agreement of down-path vs pinv-path re-quantization
  - speaker-similarity margin of decodes through each path
  - the margins for sampled styles (teacher + student), each path

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/probe_quantizer_roundtrip.py \
        --workdir runs/r5 --out docs/artifacts/quantizer_roundtrip_r5.json
"""
from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="runs/r5")
    ap.add_argument("--out",
                    default="docs/artifacts/quantizer_roundtrip_r5.json")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    from styletts_zs_tpu.models.diffusion import StyleDiffusion
    from styletts_zs_tpu.models.tts import StyleTTSZS
    from styletts_zs_tpu.ops import fsq as fsq_ops
    from styletts_zs_tpu.ops import stft as stft_ops
    from styletts_zs_tpu.ops.attention import length_mask
    from styletts_zs_tpu.pipelines.checkpoint import load_params
    from styletts_zs_tpu.pipelines.data import SyntheticDataset
    from styletts_zs_tpu.pipelines.factory import build_models, init_params
    from styletts_zs_tpu.utils.cache import enable_compilation_cache
    from styletts_zs_tpu.utils.config import Config, tiny_test_config

    enable_compilation_cache()
    cfg = tiny_test_config() if args.tiny else Config()
    like = init_params(cfg, jax.random.PRNGKey(0))
    p = load_params(f"{args.workdir}/stage1",
                    like={"acoustic": like["acoustic"],
                          "vocoder": like["vocoder"]})
    p_ac = p["acoustic"]
    p_student = load_params(f"{args.workdir}/final", like={
        "acoustic": like["acoustic"], "vocoder": like["vocoder"],
        "diffusion": like["diffusion"]})["diffusion"]
    acoustic, diffusion, _, _ = build_models(cfg)
    m = cfg.model
    levels = m.style.fsq_levels
    n_frames = min(m.max_frames, 128 if args.tiny else 256)
    b = SyntheticDataset(m, batch_size=cfg.train.batch_size,
                         seed=cfg.train.seed + 10_000,
                         n_frames=n_frames).next_batch()
    phonemes = jnp.asarray(b.phonemes)
    text_mask = length_mask(jnp.asarray(b.text_lengths), phonemes.shape[1])
    frame_mask = length_mask(jnp.asarray(b.frame_lengths), n_frames)
    mel_gt = stft_ops.mel_spectrogram(jnp.asarray(b.wav), m.audio)[:, :n_frames]
    ref_mel = stft_ops.mel_spectrogram(jnp.asarray(b.ref_wav), m.audio)
    styled_gt, codes_gt, idx_gt = acoustic.apply(
        p_ac, mel_gt, frame_mask, method=StyleTTSZS.extract_style)

    # --- the two re-quantization paths --------------------------------
    q = p_ac["params"]["quantizer"]
    W = np.asarray(q["up"]["kernel"], np.float64)       # (d_fsq, d_style)
    bb = np.asarray(q["up"]["bias"], np.float64)
    W_pinv = jnp.asarray(np.linalg.pinv(W), jnp.float32)  # (d_style, d_fsq)

    def pinv_quantize(s):
        z = (s.astype(jnp.float32) - jnp.asarray(bb, jnp.float32)) @ W_pinv
        lv = jnp.asarray(np.asarray(levels, np.float32))
        digit = jnp.clip(jnp.round((z + 1.0) * (lv - 1.0) / 2.0), 0, lv - 1)
        codes = 2.0 * digit / (lv - 1.0) - 1.0
        up = acoustic.apply(
            p_ac, codes.astype(styled_gt.dtype),
            method=lambda mdl, c: mdl.quantizer.decode_codes(c))
        return up, codes

    def down_quantize(s):
        return acoustic.apply(p_ac, s, method=StyleTTSZS.quantize_style)

    def agree(codes):
        return float(jnp.mean(jnp.all(
            jnp.isclose(codes, codes_gt, atol=1e-3), axis=-1)
            .astype(jnp.float32)))

    s_down = down_quantize(styled_gt)
    _, c_down = acoustic.apply(p_ac, styled_gt,
                               method=lambda mdl, s: mdl.quantizer(s)[:2])
    s_pinv, c_pinv = pinv_quantize(styled_gt)

    def embed_mel(mel):
        _, s = acoustic.apply(p_ac, mel, method=StyleTTSZS.encode_prompt)
        e = np.asarray(s, np.float32)
        return e / np.maximum(np.linalg.norm(e, axis=-1, keepdims=True), 1e-8)

    e_ref = embed_mel(ref_mel)

    def margin_of(mel):
        sims = embed_mel(mel) @ e_ref.T
        B = sims.shape[0]
        pos = np.diag(sims).copy()
        acc = float((sims.argmax(1) == np.arange(B)).mean())
        np.fill_diagonal(sims, -np.inf)
        return {"margin": round(float((pos - sims.max(1)).mean()), 4),
                "retrieval": round(acc, 4)}

    def decode(style):
        return acoustic.apply(p_ac, phonemes, style, text_mask=text_mask,
                              durations=jnp.asarray(b.durations),
                              n_frames=n_frames,
                              method=StyleTTSZS.text_to_mel).mel

    out: dict = {
        "workdir": args.workdir,
        "code_agreement_down_roundtrip": agree(c_down),
        "code_agreement_pinv_roundtrip": agree(c_pinv),
        "style_mse_down_roundtrip": round(float(jnp.mean(
            (s_down.astype(jnp.float32)
             - styled_gt.astype(jnp.float32)) ** 2)), 5),
        "style_mse_pinv_roundtrip": round(float(jnp.mean(
            (s_pinv.astype(jnp.float32)
             - styled_gt.astype(jnp.float32)) ** 2)), 5),
        "margin_decode_gt": margin_of(decode(styled_gt)),
        "margin_decode_down_requant": margin_of(decode(s_down)),
        "margin_decode_pinv_requant": margin_of(decode(s_pinv)),
    }
    print(json.dumps(out, indent=1), flush=True)

    # --- sampled styles through each path ------------------------------
    tokens, summary = acoustic.apply(p_ac, ref_mel,
                                     method=StyleTTSZS.encode_prompt)
    text_enc, _ = acoustic.apply(p_ac, phonemes, text_mask,
                                 method=StyleTTSZS.encode_text)
    s_smp = diffusion.apply(p_student, jax.random.PRNGKey(7), text_enc,
                            tokens, summary, text_mask=text_mask,
                            method=StyleDiffusion.sample_onestep)
    out["margin_sample_raw"] = margin_of(decode(s_smp))
    out["margin_sample_down_requant"] = margin_of(decode(down_quantize(s_smp)))
    sp, _ = pinv_quantize(s_smp)
    out["margin_sample_pinv_requant"] = margin_of(decode(sp))
    out["sample_pinv_style_mse_vs_raw"] = round(float(jnp.mean(
        (sp.astype(jnp.float32) - s_smp.astype(jnp.float32)) ** 2)), 5)
    print(json.dumps({k: out[k] for k in
                      ("margin_sample_raw", "margin_sample_down_requant",
                       "margin_sample_pinv_requant",
                       "sample_pinv_style_mse_vs_raw")}, indent=1),
          flush=True)

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
