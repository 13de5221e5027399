"""Diagnose the round-3 quality-gate plateaus (VERDICT r2 item 1).

Three questions, each answered with a measurement:

1. Is stage-2's style_latent_mse_vs_gt floor BIAS (model collapsed away
   from the target) or SPREAD (model samples the true conditional, whose
   variance is irreducible because the synthetic corpus draws per-utterance
   random factors — energy scale, vibrato phase, breath noise — that the
   conditioning cannot reveal)?  Two independent samples A, B from the
   model: if p_model == p_true and bias == 0 then E|A-B|^2 = 2 E|A-GT|^2;
   ratio << 2 means collapse/bias, ~2 means spread-dominated.
   Ground-truth within-condition spread is measured directly: styles
   extracted from TWO different utterances of the SAME speaker.

2. Is the negative speaker-similarity margin an EMBEDDING problem or a
   SYNTHESIS problem?  Margin on ground-truth audio (own utterance vs own
   reference, negatives = other speakers' references): if GT audio scores
   a healthy positive margin, the embedding is discriminative and the
   synthesis path is what loses identity.

3. Does identity die in the acoustic model or the vocoder?  Margin
   computed on the synthesized MEL directly (prompt encoder consumes mel)
   vs on the vocoded waveform's mel.

Usage: python scripts/diagnose_quality.py --workdir /root/repo/runs/r3b \
           [--out docs/artifacts/diagnose_quality_r3.json]
"""
from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def margin_from_mels(acoustic, acoustic_params, synth_mel, ref_mel):
    from styletts_zs_tpu.models.tts import StyleTTSZS

    def embed(mel):
        _, summary = acoustic.apply(acoustic_params, mel,
                                    method=StyleTTSZS.encode_prompt)
        e = summary.astype(jnp.float32)
        return e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True),
                               1e-8)

    # np.array (copy): np.asarray on a JAX array returns a READ-ONLY view,
    # and np.fill_diagonal below writes in place (r3 crash: EXIT 1 at Q3)
    sims = np.array(embed(synth_mel) @ embed(ref_mel).T)
    B = sims.shape[0]
    pos = np.diag(sims).copy()
    retrieval = float((sims.argmax(axis=1) == np.arange(B)).mean())
    np.fill_diagonal(sims, -np.inf)
    neg = sims.max(axis=1)
    return {"sim_pos_mean": round(float(pos.mean()), 4),
            "sim_neg_max_mean": round(float(neg.mean()), 4),
            "sim_margin": round(float((pos - neg).mean()), 4),
            "retrieval_acc": round(retrieval, 4)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/root/repo/runs/r3b")
    ap.add_argument("--stage1-dir", default=None,
                    help="stage-1 save_params dir (default: workdir/stage1)")
    ap.add_argument("--out", default="docs/artifacts/diagnose_quality_r3.json")
    args = ap.parse_args()
    stage1_dir = args.stage1_dir or f"{args.workdir}/stage1"

    from styletts_zs_tpu.models.diffusion import StyleDiffusion
    from styletts_zs_tpu.models.tts import StyleTTSZS
    from styletts_zs_tpu.ops import stft as stft_ops
    from styletts_zs_tpu.ops.attention import length_mask
    from styletts_zs_tpu.pipelines.checkpoint import load_params
    from styletts_zs_tpu.pipelines.data import SyntheticDataset
    from styletts_zs_tpu.pipelines.eval import speaker_similarity_margin
    from styletts_zs_tpu.pipelines.factory import build_models, init_params
    from styletts_zs_tpu.pipelines.infer import Synthesizer
    from styletts_zs_tpu.utils.cache import enable_compilation_cache
    from styletts_zs_tpu.utils.config import Config, tiny_test_config
    enable_compilation_cache()

    cfg = tiny_test_config() if jax.default_backend() == "cpu" else Config()
    n_frames = 128 if jax.default_backend() == "cpu" else 256
    like = init_params(cfg, jax.random.PRNGKey(0))
    stage1 = load_params(stage1_dir,
                         like={"acoustic": like["acoustic"],
                               "vocoder": like["vocoder"]})
    teacher = load_params(f"{args.workdir}/stage2", like=like["diffusion"])
    student = load_params(f"{args.workdir}/final", like={
        "acoustic": like["acoustic"], "vocoder": like["vocoder"],
        "diffusion": like["diffusion"]})["diffusion"]
    acoustic, diffusion, _, _ = build_models(cfg)
    m = cfg.model
    p_ac = stage1["acoustic"]

    batch = SyntheticDataset(m, batch_size=16, seed=cfg.train.seed + 10_000,
                             n_frames=n_frames).next_batch()
    report: dict = {"workdir": args.workdir, "held_out_batch": 16}

    # ---- Q1: bias vs spread ------------------------------------------
    phonemes = jnp.asarray(batch.phonemes)
    text_mask = length_mask(jnp.asarray(batch.text_lengths),
                            phonemes.shape[1])
    mel_gt = stft_ops.mel_spectrogram(jnp.asarray(batch.wav), m.audio)
    mel_gt = mel_gt[:, :batch.f0.shape[1]]
    frame_mask = length_mask(jnp.asarray(batch.frame_lengths),
                             batch.f0.shape[1])
    ref_mel = stft_ops.mel_spectrogram(jnp.asarray(batch.ref_wav), m.audio)
    tokens, summary = acoustic.apply(p_ac, ref_mel,
                                     method=StyleTTSZS.encode_prompt)
    text_enc, _ = acoustic.apply(p_ac, phonemes, text_mask,
                                 method=StyleTTSZS.encode_text)
    style_gt, _, _ = acoustic.apply(p_ac, mel_gt, frame_mask,
                                    method=StyleTTSZS.extract_style)

    def sample(seed):
        return diffusion.apply(teacher, jax.random.PRNGKey(seed), text_enc,
                               tokens, summary, text_mask=text_mask,
                               method=StyleDiffusion.sample)

    sa, sb = sample(1), sample(2)
    mse = lambda a, b: float(jnp.mean((a.astype(jnp.float32)
                                       - b.astype(jnp.float32)) ** 2))
    m_agt, m_bgt, m_ab = mse(sa, style_gt), mse(sb, style_gt), mse(sa, sb)
    # true within-condition spread: styles of two different utterances of
    # the SAME synthetic speaker (ref_wav is exactly that second utterance)
    ref_frames = min(ref_mel.shape[1], batch.f0.shape[1])
    ref_mask = length_mask(
        jnp.full((16,), ref_frames, jnp.int32), ref_frames)
    style_ref, _, _ = acoustic.apply(p_ac, ref_mel[:, :ref_frames], ref_mask,
                                     method=StyleTTSZS.extract_style)
    m_gt_spread = mse(style_gt, style_ref)
    report["q1_bias_vs_spread"] = {
        "mse_sampleA_vs_gt": round(m_agt, 5),
        "mse_sampleB_vs_gt": round(m_bgt, 5),
        "mse_sampleA_vs_sampleB": round(m_ab, 5),
        "ratio_ab_over_agt": round(m_ab / max(m_agt, 1e-9), 3),
        "gt_within_speaker_style_mse": round(m_gt_spread, 5),
        "note": "ratio ~2 => spread-dominated (converged to conditional); "
                "<<2 => bias/collapse. gt_within_speaker_style_mse is the "
                "data's own irreducible within-speaker style variation "
                "(different utterance, same speaker).",
    }
    print(json.dumps(report["q1_bias_vs_spread"]), flush=True)

    # ---- Q2: embedding vs synthesis ----------------------------------
    L = min(batch.wav.shape[1], batch.ref_wav.shape[1])
    report["q2_margin_on_ground_truth_audio"] = {
        k: round(float(v), 4) for k, v in speaker_similarity_margin(
            cfg, p_ac, jnp.asarray(batch.wav[:, :L]),
            jnp.asarray(batch.ref_wav[:, :L])).items()}
    print(json.dumps(report["q2_margin_on_ground_truth_audio"]), flush=True)

    # ---- Q3: acoustic-model mel vs vocoded wav ------------------------
    bundle = {"acoustic": p_ac, "vocoder": stage1["vocoder"],
              "diffusion": student}
    syn = Synthesizer(cfg, bundle)
    out, wav = syn.synthesize(phonemes, jnp.asarray(batch.ref_wav),
                              text_lengths=jnp.asarray(batch.text_lengths),
                              n_frames=n_frames)
    report["q3_margin_synth_mel_direct"] = margin_from_mels(
        acoustic, p_ac, out.mel.astype(jnp.float32), ref_mel)
    wav_mel = stft_ops.mel_spectrogram(wav, m.audio)
    report["q3_margin_synth_wav_mel"] = margin_from_mels(
        acoustic, p_ac, wav_mel, ref_mel)
    # teacher-forced decode (gt style + durations) isolates the decoder:
    out_tf, _, _ = acoustic.apply(
        p_ac, phonemes, mel_gt, jnp.asarray(batch.durations),
        text_mask=text_mask, frame_mask=frame_mask,
        method=StyleTTSZS.reconstruct)
    report["q3_margin_teacher_forced_mel"] = margin_from_mels(
        acoustic, p_ac, out_tf.mel.astype(jnp.float32), ref_mel)
    report["q3_margin_gt_mel"] = margin_from_mels(
        acoustic, p_ac, mel_gt, ref_mel)
    for k in ("q3_margin_synth_mel_direct", "q3_margin_synth_wav_mel",
              "q3_margin_teacher_forced_mel", "q3_margin_gt_mel"):
        print(json.dumps({k: report[k]}), flush=True)

    # ---- Q4: stage-2 gate noise band (VERDICT r3 item 3) --------------
    # Re-evaluate the committed teacher with 4 sampler seeds: how much of
    # the held-out curve's movement (0.354 -> 0.596) is single-sample
    # sampler noise vs real drift?  (r3b saved only the final EMA params,
    # so the band is sized at the end point; the r4 run gates every
    # checkpoint with n_seeds=4 so the full curve carries its own band.)
    from styletts_zs_tpu.pipelines.eval import evaluate_diffusion
    report["q4_stage2_gate_noise_band"] = evaluate_diffusion(
        cfg, p_ac, teacher, batch, jax.random.PRNGKey(7), n_seeds=4)
    print(json.dumps({"q4": report["q4_stage2_gate_noise_band"]}), flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
