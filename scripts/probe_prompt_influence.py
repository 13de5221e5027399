"""How much does the zero-shot prompt actually steer the style sampler?

r4's final gate showed GT-audio retrieval 1.0 (the embedding is
discriminative) but synth retrieval 0.0 — identity dies somewhere between
the prompt and the waveform.  This probe isolates the sampler's share:

  1. sample styles with ALIGNED prompts vs PERMUTED prompts (same rng):
     if the outputs are (near-)identical the sampler ignores the prompt;
  2. per-guidance-scale sweep of the speaker-similarity margin of the
     decoded mels (teacher multi-step and student 1-step), vs the
     teacher-forced (GT-style) margin ceiling.

    python scripts/probe_prompt_influence.py --workdir runs/r4 \
        [--out docs/artifacts/prompt_influence_r4.json]
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
    ap.add_argument("--workdir", default="runs/r4")
    ap.add_argument("--out", default="docs/artifacts/prompt_influence_r4.json")
    ap.add_argument("--guidance", type=float, nargs="*",
                    default=[1.0, 2.0, 3.0, 5.0, 7.0])
    ap.add_argument("--full", action="store_true",
                    help="force the full-size config even on CPU (loads a "
                         "real trained bundle; slower but runs when the TPU "
                         "tunnel is unavailable — mel-level metrics only)")
    args = ap.parse_args()

    from styletts_zs_tpu.models.diffusion import StyleDiffusion
    from styletts_zs_tpu.models.tts import StyleTTSZS
    from styletts_zs_tpu.ops import stft as stft_ops
    from styletts_zs_tpu.ops.attention import length_mask
    from styletts_zs_tpu.pipelines.checkpoint import load_params
    from styletts_zs_tpu.pipelines.data import SyntheticDataset
    from styletts_zs_tpu.pipelines.eval import mel_mae
    from styletts_zs_tpu.pipelines.factory import build_models, init_params
    from styletts_zs_tpu.utils.cache import enable_compilation_cache
    from styletts_zs_tpu.utils.config import Config, tiny_test_config

    enable_compilation_cache()
    tiny = jax.default_backend() == "cpu" and not args.full
    cfg = tiny_test_config() if tiny else Config()
    like = init_params(cfg, jax.random.PRNGKey(0))
    p_ac = load_params(f"{args.workdir}/stage1",
                       like={"acoustic": like["acoustic"],
                             "vocoder": like["vocoder"]})["acoustic"]
    p_teacher = load_params(f"{args.workdir}/stage2", like=like["diffusion"])
    p_student = load_params(f"{args.workdir}/final", like={
        "acoustic": like["acoustic"], "vocoder": like["vocoder"],
        "diffusion": like["diffusion"]})["diffusion"]

    acoustic, diffusion, _, _ = build_models(cfg)
    m = cfg.model
    n_frames = min(m.max_frames, 128 if tiny else 256)
    ds = SyntheticDataset(m, batch_size=cfg.train.batch_size,
                          seed=cfg.train.seed + 10_000, n_frames=n_frames)
    b = ds.next_batch()  # the SAME held-out batch the quality gates use
    phonemes = jnp.asarray(b.phonemes)
    text_mask = length_mask(jnp.asarray(b.text_lengths), phonemes.shape[1])
    frame_mask = length_mask(jnp.asarray(b.frame_lengths), n_frames)
    mel_gt = stft_ops.mel_spectrogram(jnp.asarray(b.wav), m.audio)[:, :n_frames]
    ref_mel = stft_ops.mel_spectrogram(jnp.asarray(b.ref_wav), m.audio)
    tokens, summary = acoustic.apply(p_ac, ref_mel,
                                     method=StyleTTSZS.encode_prompt)
    text_enc, _ = acoustic.apply(p_ac, phonemes, text_mask,
                                 method=StyleTTSZS.encode_text)
    styled_gt, _, _ = acoustic.apply(p_ac, mel_gt, frame_mask,
                                     method=StyleTTSZS.extract_style)
    durations = jnp.asarray(b.durations)

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
        s = acoustic.apply(p_ac, style, method=StyleTTSZS.quantize_style)
        return acoustic.apply(p_ac, phonemes, s, text_mask=text_mask,
                              durations=durations, n_frames=n_frames,
                              method=StyleTTSZS.text_to_mel).mel

    rng = jax.random.PRNGKey(42)
    perm = np.roll(np.arange(phonemes.shape[0]), 1)

    out: dict = {"workdir": args.workdir,
                 "gt_margin": margin_of(mel_gt),
                 "teacher_forced_margin": margin_of(decode(styled_gt))}

    def sample(params, one_step, g, tok, summ):
        if one_step:
            return diffusion.apply(params, rng, text_enc, tok, summ,
                                   text_mask=text_mask, guidance=g,
                                   method=StyleDiffusion.sample_onestep)
        return diffusion.apply(params, rng, text_enc, tok, summ,
                               text_mask=text_mask, guidance=g,
                               method=StyleDiffusion.sample)

    # 1) prompt-permutation sensitivity at the default guidance
    g0 = m.diffusion.cfg_scale
    for name, params, one_step in (("teacher", p_teacher, False),
                                   ("student", p_student, True)):
        s_al = sample(params, one_step, g0, tokens, summary)
        s_pm = sample(params, one_step, g0, tokens[perm], summary[perm])
        delta = float(jnp.mean((s_al - s_pm) ** 2))
        sample_var = float(jnp.var(s_al))
        out[f"{name}_prompt_permutation_mse"] = round(delta, 5)
        out[f"{name}_sample_var"] = round(sample_var, 5)
        out[f"{name}_perm_sensitivity"] = round(delta / max(sample_var, 1e-9), 4)

    # 2) guidance sweep of the decoded-mel margin
    for name, params, one_step in (("teacher", p_teacher, False),
                                   ("student", p_student, True)):
        rows = []
        for g in args.guidance:
            s = sample(params, one_step, float(g), tokens, summary)
            mm = margin_of(decode(s))
            mm["guidance"] = g
            mm["latent_mse_vs_gt"] = round(float(
                jnp.mean((s - styled_gt) ** 2)), 4)
            mm["mel_mae_vs_gt_style_decode"] = round(float(
                mel_mae(decode(s), decode(styled_gt),
                        frame_mask)), 4)
            rows.append(mm)
            print(json.dumps({name: mm}), flush=True)
        out[f"{name}_guidance_sweep"] = rows

    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
