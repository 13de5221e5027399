"""Evaluation metrics: mel MAE, RTF, speaker-similarity proxy.

SURVEY.md §1.2 L4 "eval (mel MAE, RTF, audio-s/s/chip)".  Without human MOS
raters or a pretrained speaker-verification net (offline box), speaker
similarity is proxied by the framework's own prompt-encoder embedding cosine
between the synthesized audio and the reference — a self-consistency check
that tracks whether zero-shot conditioning actually steers the output.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from styletts_zs_tpu.models.tts import StyleTTSZS
from styletts_zs_tpu.ops import stft as stft_ops
from styletts_zs_tpu.pipelines.factory import build_models
from styletts_zs_tpu.utils.config import Config


def mel_mae(pred: jax.Array, target: jax.Array,
            mask: Optional[jax.Array] = None) -> float:
    """Masked mean absolute error between mel spectrograms."""
    diff = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    if mask is not None:
        m = mask.astype(jnp.float32)[..., None]
        return float(jnp.sum(diff * m) / jnp.maximum(
            jnp.sum(m) * pred.shape[-1], 1.0))
    return float(jnp.mean(diff))


def mel_spectral_distance(pred_wav: jax.Array, target_wav: jax.Array,
                          cfg: Config) -> float:
    """Log-mel L1 between two waveforms (crops to common length)."""
    L = min(pred_wav.shape[-1], target_wav.shape[-1])
    a = stft_ops.mel_spectrogram(pred_wav[..., :L], cfg.model.audio)
    b = stft_ops.mel_spectrogram(target_wav[..., :L], cfg.model.audio)
    return float(jnp.mean(jnp.abs(a - b)))


def speaker_similarity(cfg: Config, acoustic_params, wav_a: jax.Array,
                       wav_b: jax.Array) -> np.ndarray:
    """Cosine similarity of prompt-encoder summaries, (B,) per pair."""
    acoustic, _, _, _ = build_models(cfg)

    def embed(wav):
        mel = stft_ops.mel_spectrogram(wav, cfg.model.audio)
        _, summary = acoustic.apply(acoustic_params, mel,
                                    method=StyleTTSZS.encode_prompt)
        return summary.astype(jnp.float32)

    ea, eb = embed(wav_a), embed(wav_b)
    num = jnp.sum(ea * eb, axis=-1)
    den = (jnp.linalg.norm(ea, axis=-1) * jnp.linalg.norm(eb, axis=-1))
    return np.asarray(num / jnp.maximum(den, 1e-8))


def speaker_similarity_margin(cfg: Config, acoustic_params,
                              synth_wav: jax.Array,
                              ref_wav: jax.Array) -> dict:
    """Falsifiable zero-shot similarity (VERDICT r2 item 2).

    ``speaker_similarity`` alone is a self-consistency cosine with no
    negative pairs — it cannot fail.  Here every synthesized utterance is
    scored against ALL references in the batch (each batch item is a
    distinct speaker): the positive is its own reference, the negatives are
    everyone else's.  Reports
      - sim_margin: mean(pos − max over negatives) — positive iff the model
        embeds its own reference closer than any other speaker's;
      - retrieval_acc: fraction where argmax over references == own index
        (chance = 1/B).
    Obligation: ``/root/reference/README.md:5`` "high similarity to the
    reference speaker" needs a metric that CAN read low for a bad model.
    """
    acoustic, _, _, _ = build_models(cfg)

    def embed(wav):
        mel = stft_ops.mel_spectrogram(wav, cfg.model.audio)
        _, summary = acoustic.apply(acoustic_params, mel,
                                    method=StyleTTSZS.encode_prompt)
        e = summary.astype(jnp.float32)
        return e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True),
                               1e-8)

    if synth_wav.shape[0] < 2:
        # with one pair there are no negatives: hardest_neg would be -inf
        # and json.dump would emit non-standard 'Infinity' (ADVICE r3)
        raise ValueError("speaker_similarity_margin needs a batch of >= 2 "
                         "distinct speakers to form negative pairs")
    es = embed(synth_wav)                      # (B, d)
    er = embed(ref_wav)                        # (B, d)
    sims = np.asarray(es @ er.T)               # (B_synth, B_ref)
    B = sims.shape[0]
    pos = np.diag(sims)
    neg = sims.copy()
    np.fill_diagonal(neg, -np.inf)
    hardest_neg = neg.max(axis=1)
    return {
        "sim_pos_mean": float(pos.mean()),
        "sim_neg_max_mean": float(hardest_neg.mean()),
        "sim_margin": float((pos - hardest_neg).mean()),
        "retrieval_acc": float((sims.argmax(axis=1) == np.arange(B)).mean()),
        "retrieval_chance": round(1.0 / B, 4),
    }


def fsq_usage_stats(cfg: Config, acoustic_params, batch) -> dict:
    """FSQ codebook-usage diagnostics (VERDICT r2 weak item 3).

    Runs the style extractor + quantizer over a batch and reports per-dim
    level occupancy entropy (as perplexity, max = n_levels) plus the
    fraction of distinct full lattice codes — code collapse would show as
    perplexity ≈ 1 on some dim or unique_frac ≈ 0.
    """
    acoustic, _, _, _ = build_models(cfg)
    from styletts_zs_tpu.ops import fsq as fsq_ops
    from styletts_zs_tpu.ops.attention import length_mask
    m = cfg.model
    mel = stft_ops.mel_spectrogram(jnp.asarray(batch.wav), m.audio)
    n_frames = batch.f0.shape[1]
    frame_mask = length_mask(jnp.asarray(batch.frame_lengths), n_frames)
    _, codes, indices = acoustic.apply(acoustic_params, mel[:, :n_frames],
                                       frame_mask,
                                       method=StyleTTSZS.extract_style)
    levels = m.style.fsq_levels
    codes = np.asarray(codes).reshape(-1, len(levels))   # (B*K, d_fsq)
    digits = np.round((codes + 1.0) * (np.asarray(levels) - 1.0) / 2.0)
    perplexity = []
    for d, L in enumerate(levels):
        counts = np.bincount(digits[:, d].astype(np.int64), minlength=L)
        p = counts / max(counts.sum(), 1)
        ent = -(p[p > 0] * np.log(p[p > 0])).sum()
        perplexity.append(float(np.exp(ent)))
    idx2d = np.asarray(indices).reshape(codes.shape[0] // m.style.n_codes,
                                        m.style.n_codes)   # (B, K)
    idx = idx2d.reshape(-1)
    # Raw unique_frac conflates two effects (r5 decomposition,
    # docs/artifacts/fsq_usage_r5.json): adjacent style segments of ONE
    # utterance legitimately share codes (temporal smoothness, ~50%
    # repetition), which halves the raw fraction without any collapse.
    # The collapse-sensitive statistic is cross-utterance: dedupe codes
    # within each utterance first, then ask how many utterance-level codes
    # are distinct ACROSS utterances (A3 "diverse prosodic variations").
    per_utt = [np.unique(r) for r in idx2d]
    n_utt_codes = sum(u.size for u in per_utt)
    n_cross = np.unique(np.concatenate(per_utt)).size
    return {
        "fsq_dim_perplexity": [round(p, 2) for p in perplexity],
        "fsq_dim_levels": list(levels),
        "fsq_unique_codes": int(np.unique(idx).size),
        "fsq_unique_frac": round(float(np.unique(idx).size / idx.size), 4),
        "fsq_unique_frac_cross_utterance": round(
            float(n_cross / max(n_utt_codes, 1)), 4),
        "fsq_within_utt_repetition": round(
            1.0 - float(np.mean([u.size for u in per_utt]))
            / m.style.n_codes, 4),
        "fsq_n_codes_seen_of": int(idx.size),
    }


def evaluate_acoustic(cfg: Config, g_params, batch) -> dict:
    """Stage-1 boundary quality gate on a held-out batch (VERDICT r1 item 8).

    Reports the metric ladder from fully teacher-forced to fully
    free-running so regressions localize to a subsystem:
      - mel_mae_teacher_forced: decoder quality (gt style/durations/F0)
      - f0_rmse / energy_rmse / mel_mae_pred_prosody: prosody predictors
        (gt durations so frames align with the targets)
      - dur_mae_frames / dur_exact_match: duration predictor (free-running)
    """
    acoustic, _, _, _ = build_models(cfg)
    m = cfg.model
    from styletts_zs_tpu.ops.attention import length_mask
    phonemes = jnp.asarray(batch.phonemes)
    durations = jnp.asarray(batch.durations)
    mel_gt = stft_ops.mel_spectrogram(jnp.asarray(batch.wav), m.audio)
    n_frames = batch.f0.shape[1]
    mel_gt = mel_gt[:, :n_frames]
    text_mask = length_mask(jnp.asarray(batch.text_lengths),
                            phonemes.shape[1])
    frame_mask = length_mask(jnp.asarray(batch.frame_lengths), n_frames)
    p_ac = g_params["acoustic"]

    out_tf, _, styled = acoustic.apply(
        p_ac, phonemes, mel_gt, durations, text_mask=text_mask,
        frame_mask=frame_mask, f0_target=jnp.asarray(batch.f0),
        energy_target=jnp.asarray(batch.energy),
        method=StyleTTSZS.reconstruct)
    res = {"mel_mae_teacher_forced": mel_mae(out_tf.mel, mel_gt, frame_mask)}

    # predicted prosody over ground-truth durations (frame-aligned targets)
    out_pp = acoustic.apply(p_ac, phonemes, styled, text_mask=text_mask,
                            durations=durations, n_frames=n_frames,
                            method=StyleTTSZS.text_to_mel)
    res["f0_rmse"] = f0_rmse(out_pp.f0, batch.f0, np.asarray(frame_mask))
    em = np.asarray(frame_mask)
    ed = (np.asarray(out_pp.energy) - batch.energy)[em]
    res["energy_rmse"] = float(np.sqrt(np.mean(ed * ed))) if em.any() else 0.0
    res["mel_mae_pred_prosody"] = mel_mae(out_pp.mel, mel_gt, frame_mask)

    # free-running durations from the predictor
    out_fr = acoustic.apply(p_ac, phonemes, styled, text_mask=text_mask,
                            n_frames=n_frames, method=StyleTTSZS.text_to_mel)
    res.update(duration_accuracy(out_fr.durations, batch.durations,
                                 np.asarray(text_mask)))
    return {k: round(float(v), 5) for k, v in res.items()}


def evaluate_diffusion(cfg: Config, acoustic_params, diffusion_params, batch,
                       rng, *, n_steps: Optional[int] = None,
                       one_step: bool = False, n_seeds: int = 1,
                       guidance: Optional[float] = None) -> dict:
    """Stage-2/3 boundary gate: sampled style vs ground-truth-extracted style
    (latent space) and decoded-mel perceptual distance (mel space).

    ``n_seeds > 1`` (VERDICT r3 items 3-4) sizes the single-sample sampler
    noise band — ``style_latent_mse_std`` over seeds — and reports the
    dispersion-aware score ``style_mse_ratio_pairs_over_gt``: mean pairwise
    E|A-B|^2 between independent samples divided by mean E|A-GT|^2.

    Calibration (re-derived r5; ``tests/test_metrics_eval.py::
    test_dispersion_ratio_calibration``): GT is itself one DRAW from the
    conditional p(style | text, speaker), not its mean, so for a perfect
    sampler numerator and denominator are both 2*sigma^2 and the ratio is
    **1** (collapsed -> 0; biased-but-spread -> <1; the r4 target of 2
    assumed GT = conditional mean and is unreachable by a correct sampler).
    Evaluate at ``guidance=1.0`` for the dispersion reading — CFG guidance
    g>1 sharpens the sampled distribution by design and shrinks the ratio
    (measured on the r4 teacher: 1.08 at g=1 vs 0.79 at g=3,
    ``docs/artifacts/dispersion_sweep_r5.json``).  This replaces the
    unachievable exact-lattice ``fsq_code_match_rate`` target: the synthetic
    corpus's own within-speaker style spread (measured 0.545 MSE,
    ``docs/artifacts/diagnose_quality_r3.json`` q1) is the same magnitude as
    the sampler error, so exact code match cannot be the gate.
    """
    from styletts_zs_tpu.models.diffusion import StyleDiffusion
    from styletts_zs_tpu.ops.attention import length_mask
    acoustic, diffusion, _, _ = build_models(cfg)
    m = cfg.model
    phonemes = jnp.asarray(batch.phonemes)
    mel_gt = stft_ops.mel_spectrogram(jnp.asarray(batch.wav), m.audio)
    n_frames = batch.f0.shape[1]
    mel_gt = mel_gt[:, :n_frames]
    text_mask = length_mask(jnp.asarray(batch.text_lengths),
                            phonemes.shape[1])
    frame_mask = length_mask(jnp.asarray(batch.frame_lengths), n_frames)
    ref_mel = stft_ops.mel_spectrogram(jnp.asarray(batch.ref_wav), m.audio)

    tokens, summary = acoustic.apply(acoustic_params, ref_mel,
                                     method=StyleTTSZS.encode_prompt)
    text_enc, _ = acoustic.apply(acoustic_params, phonemes, text_mask,
                                 method=StyleTTSZS.encode_text)
    styled_gt, _, _ = acoustic.apply(acoustic_params, mel_gt, frame_mask,
                                     method=StyleTTSZS.extract_style)
    def draw(r):
        if one_step:
            return diffusion.apply(diffusion_params, r, text_enc, tokens,
                                   summary, text_mask=text_mask,
                                   guidance=guidance,
                                   method=StyleDiffusion.sample_onestep)
        return diffusion.apply(diffusion_params, r, text_enc, tokens,
                               summary, text_mask=text_mask, n_steps=n_steps,
                               guidance=guidance,
                               method=StyleDiffusion.sample)

    seeds = jax.random.split(rng, max(n_seeds, 1))
    samples = [draw(s) for s in seeds]
    style = samples[0]

    # decode over ground-truth durations: both paths share them, so the mel
    # gap isolates the style pathway (free-running durations from an
    # early-training predictor can be all-zero, which would make the masked
    # MAE vacuously 0.0)
    durations = jnp.asarray(batch.durations)

    def decode(s, quantize):
        if quantize:
            s = acoustic.apply(acoustic_params, s,
                               method=StyleTTSZS.quantize_style)
        return acoustic.apply(acoustic_params, phonemes, s,
                              text_mask=text_mask, durations=durations,
                              n_frames=n_frames,
                              method=StyleTTSZS.text_to_mel)

    out_s = decode(style, True)
    out_gt = decode(styled_gt, True)

    def _mse(a, b):
        return float(jnp.mean((a.astype(jnp.float32)
                               - b.astype(jnp.float32)) ** 2))

    per_seed = [_mse(s, styled_gt) for s in samples]
    latent = per_seed[0]
    mask = out_gt.frame_mask & out_s.frame_mask
    # raw (unquantized) decode: the FSQ lattice is coarse, so early in
    # training both styles can collapse to identical codes and the
    # quantized mel gap reads exactly 0.0 — the raw gap plus the code-match
    # rate disambiguate "identical codes" from "identical styles"
    out_s_raw = decode(style, False)
    out_gt_raw = decode(styled_gt, False)
    q_s = acoustic.apply(acoustic_params, style,
                         method=StyleTTSZS.quantize_style)
    q_gt = acoustic.apply(acoustic_params, styled_gt,
                          method=StyleTTSZS.quantize_style)
    code_match = float(jnp.mean(jnp.all(
        jnp.isclose(q_s, q_gt), axis=-1).astype(jnp.float32)))
    res = {"style_latent_mse_vs_gt": round(latent, 5),
           "mel_mae_sampled_vs_gt_style": round(
               mel_mae(out_s.mel, out_gt.mel, mask), 5),
           "mel_mae_sampled_vs_gt_style_raw": round(
               mel_mae(out_s_raw.mel, out_gt_raw.mel, mask), 5),
           "fsq_code_match_rate": round(code_match, 4)}
    if n_seeds > 1:
        pairs = [_mse(samples[i], samples[j])
                 for i in range(n_seeds) for j in range(i + 1, n_seeds)]
        res["style_latent_mse_mean"] = round(float(np.mean(per_seed)), 5)
        res["style_latent_mse_std"] = round(float(np.std(per_seed)), 5)
        res["style_latent_mse_seeds"] = n_seeds
        res["style_mse_ratio_pairs_over_gt"] = round(
            float(np.mean(pairs)) / max(float(np.mean(per_seed)), 1e-9), 3)
    return res


def evaluate_distill_gap(cfg: Config, acoustic_params, teacher_params,
                         student_params, batch, rng, *,
                         n_teacher_steps: Optional[int] = None) -> dict:
    """A7 quality-preservation gate: teacher (multi-step) vs distilled
    student (1-step) from identical noise/conditioning — latent MSE and
    perceptual (decoded-mel L1) gap."""
    from styletts_zs_tpu.models.diffusion import StyleDiffusion
    from styletts_zs_tpu.ops.attention import length_mask
    acoustic, diffusion, _, _ = build_models(cfg)
    m = cfg.model
    phonemes = jnp.asarray(batch.phonemes)
    text_mask = length_mask(jnp.asarray(batch.text_lengths),
                            phonemes.shape[1])
    ref_mel = stft_ops.mel_spectrogram(jnp.asarray(batch.ref_wav), m.audio)
    tokens, summary = acoustic.apply(acoustic_params, ref_mel,
                                     method=StyleTTSZS.encode_prompt)
    text_enc, _ = acoustic.apply(acoustic_params, phonemes, text_mask,
                                 method=StyleTTSZS.encode_text)
    n_steps = n_teacher_steps or m.diffusion.n_steps

    s_teacher = diffusion.apply(teacher_params, rng, text_enc, tokens,
                                summary, text_mask=text_mask, n_steps=n_steps,
                                method=StyleDiffusion.sample)
    s_student = diffusion.apply(student_params, rng, text_enc, tokens,
                                summary, text_mask=text_mask,
                                method=StyleDiffusion.sample_onestep)
    latent = float(jnp.mean((s_student.astype(jnp.float32)
                             - s_teacher.astype(jnp.float32)) ** 2))

    n_frames = batch.f0.shape[1]

    durations = jnp.asarray(batch.durations)  # shared gt durations (see
    # evaluate_diffusion's decode comment)

    def decode(s, quantize):
        if quantize:
            s = acoustic.apply(acoustic_params, s,
                               method=StyleTTSZS.quantize_style)
        return acoustic.apply(acoustic_params, phonemes, s,
                              text_mask=text_mask, durations=durations,
                              n_frames=n_frames,
                              method=StyleTTSZS.text_to_mel)

    out_t = decode(s_teacher, True)
    out_s = decode(s_student, True)
    out_t_raw = decode(s_teacher, False)
    out_s_raw = decode(s_student, False)
    mask = out_t.frame_mask & out_s.frame_mask
    return {"distill_latent_mse": round(latent, 5),
            "distill_perceptual_mel_l1": round(
                mel_mae(out_s.mel, out_t.mel, mask), 5),
            "distill_perceptual_mel_l1_raw": round(
                mel_mae(out_s_raw.mel, out_t_raw.mel, mask), 5)}


def duration_accuracy(pred_dur: jax.Array, true_dur: jax.Array,
                      text_mask: jax.Array) -> dict:
    """Per-phoneme duration agreement metrics."""
    m = np.asarray(text_mask)
    p = np.asarray(pred_dur)[m]
    t = np.asarray(true_dur)[m]
    return {
        "dur_mae_frames": float(np.abs(p - t).mean()),
        "dur_exact_match": float((p == t).mean()),
    }


def f0_rmse(pred_f0: jax.Array, true_f0: jax.Array,
            frame_mask: jax.Array) -> float:
    """RMSE over voiced frames (true_f0 != 0 in normalized-log space)."""
    m = np.asarray(frame_mask) & (np.asarray(true_f0) != 0)
    if not m.any():
        return 0.0
    d = (np.asarray(pred_f0) - np.asarray(true_f0))[m]
    return float(np.sqrt(np.mean(d * d)))
