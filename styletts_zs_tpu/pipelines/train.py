"""Training pipelines: stage 1 (acoustic GAN), stage 2 (style diffusion),
stage 3 (1-step distillation).

Stage structure follows the reference abstract's ordering (adversarial
representation learning -> latent diffusion -> perceptual distillation,
``/root/reference/README.md:5``; call stacks SURVEY.md §3.3-3.5).

Data parallelism: every step is a single ``jax.jit`` program; with a mesh,
batches carry ``NamedSharding(P('data'))`` and params are replicated (or
model-sharded per ``parallel.sharding``) — GSPMD inserts the gradient
reductions over ICI (SURVEY.md §2.4).  fp32 master params, bf16-capable
compute, LSGAN for stability (SURVEY.md §7.2 item 3).
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from styletts_zs_tpu.models.diffusion import StyleDiffusion
from styletts_zs_tpu.models.tts import StyleTTSZS
from styletts_zs_tpu.models.discriminators import (discriminator_loss,
                                                   feature_matching_loss,
                                                   generator_adv_loss)
from styletts_zs_tpu.ops import align as align_ops
from styletts_zs_tpu.ops import fsq as fsq_ops
from styletts_zs_tpu.ops import stft as stft_ops
from styletts_zs_tpu.ops.attention import length_mask
from styletts_zs_tpu.pipelines.factory import build_models
from styletts_zs_tpu.utils.config import Config


class TrainState(NamedTuple):
    step: jax.Array
    g_params: Any
    d_params: Any
    g_opt: Any
    d_opt: Any
    ema_params: Any


def make_optimizer(cfg: Config, lr: Optional[float] = None):
    t = cfg.train
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr or t.lr, t.warmup_steps, max(t.n_steps, t.warmup_steps + 1))
    return optax.chain(
        optax.clip_by_global_norm(t.grad_clip),
        optax.adamw(sched, b1=t.adam_b1, b2=t.adam_b2,
                    weight_decay=t.weight_decay),
    )


def _masked_l1(a, b, mask):
    m = mask.astype(jnp.float32)
    while m.ndim < a.ndim:
        m = m[..., None]
    diff = jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)) * m
    return jnp.sum(diff) / jnp.maximum(jnp.sum(m) * (a.shape[-1] if a.ndim > m.ndim else 1.0), 1.0)


def _masked_l1_feat(a, b, mask):
    """L1 over (B, T, C) with (B, T) mask."""
    m = mask.astype(jnp.float32)[..., None]
    diff = jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)) * m
    return jnp.sum(diff) / jnp.maximum(jnp.sum(m) * a.shape[-1], 1.0)


def _l2normalize(e):
    e = e.astype(jnp.float32)
    return e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-8)


# ---------------------------------------------------------------------------
# stage 1: acoustic autoencoder, adversarial (SURVEY.md §3.3)
# ---------------------------------------------------------------------------

class Stage1Trainer:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.acoustic, _, self.vocoder, self.discriminator = build_models(cfg)
        self.g_tx = make_optimizer(cfg)
        self.d_tx = make_optimizer(cfg, cfg.train.lr_disc)

    def init_state(self, params) -> TrainState:
        # copy: the state is donated every step and must not alias caller
        # buffers (which stay live, e.g. as stage-2's frozen encoders)
        g_params = jax.tree.map(
            jnp.array,
            {"acoustic": params["acoustic"], "vocoder": params["vocoder"]})
        d_params = jax.tree.map(jnp.array, params["discriminator"])
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_params, d_params=d_params,
            g_opt=self.g_tx.init(g_params), d_opt=self.d_tx.init(d_params),
            # fresh buffers: ema must not alias donated g_params
            ema_params=jax.tree.map(jnp.array, g_params))

    def _forward_g(self, g_params, batch, rng):
        m = self.cfg.model
        t = self.cfg.train
        mel_gt = stft_ops.mel_spectrogram(batch["wav"], m.audio)
        n_frames = batch["f0"].shape[1]
        mel_gt = mel_gt[:, :n_frames]
        text_mask = length_mask(batch["text_lengths"], batch["phonemes"].shape[1])
        frame_mask = length_mask(batch["frame_lengths"], n_frames)

        # built-in aligner (SURVEY.md §7.2-4): forward-sum objective over
        # alignment energies; optionally MAS hard durations replace the
        # dataset's (for corpora without duration annotations)
        durations = batch["durations"]
        energies = None
        if t.w_align > 0 or t.use_mas_durations:
            def _align(mdl, phonemes, mel, mask):
                te, _ = mdl.encode_text(phonemes, mask)
                return mdl.align_energies(te, mel, text_mask=mask)
            energies = self.acoustic.apply(
                g_params["acoustic"], batch["phonemes"], mel_gt, text_mask,
                method=_align)
            if t.use_mas_durations:
                durations = jax.lax.stop_gradient(
                    align_ops.monotonic_alignment_search(
                        energies, batch["text_lengths"],
                        batch["frame_lengths"]))

        out, codes, styled = self.acoustic.apply(
            g_params["acoustic"], batch["phonemes"], mel_gt,
            durations, text_mask=text_mask, frame_mask=frame_mask,
            f0_target=batch["f0"], energy_target=batch["energy"],
            deterministic=False, rngs={"dropout": rng},
            method=StyleTTSZS.reconstruct)
        wav_hat = self.vocoder.apply(g_params["vocoder"], out.mel,
                                     mask=frame_mask)
        return out, wav_hat, mel_gt, text_mask, frame_mask, energies, durations

    def g_loss(self, g_params, d_params, batch, rng):
        t = self.cfg.train
        out, wav_hat, mel_gt, text_mask, frame_mask, energies, durations = (
            self._forward_g(g_params, batch, rng))
        L = min(wav_hat.shape[1], batch["wav"].shape[1])
        wav_gt = batch["wav"][:, :L]
        wav_fake = wav_hat[:, :L]

        fake_lg, fake_ft = self.discriminator.apply(d_params, wav_fake, out.mel)
        real_lg, real_ft = self.discriminator.apply(d_params, wav_gt, mel_gt)
        real_lg = jax.tree.map(jax.lax.stop_gradient, real_lg)
        real_ft = jax.tree.map(jax.lax.stop_gradient, real_ft)

        loss_mel = _masked_l1_feat(out.mel, mel_gt, frame_mask)
        loss_adv = generator_adv_loss(fake_lg)
        loss_fm = feature_matching_loss(real_ft, fake_ft)
        dur_target = jnp.log1p(durations.astype(jnp.float32))
        loss_dur = _masked_l1(out.log_dur, dur_target, text_mask)
        loss_f0 = _masked_l1(out.f0, batch["f0"], frame_mask)
        loss_en = _masked_l1(out.energy, batch["energy"], frame_mask)

        loss = (t.w_mel * loss_mel + t.w_adv * loss_adv + t.w_fm * loss_fm
                + t.w_dur * loss_dur + t.w_f0 * loss_f0 + t.w_energy * loss_en)
        aux = {"mel": loss_mel, "adv_g": loss_adv, "fm": loss_fm,
               "dur": loss_dur, "f0": loss_f0, "energy": loss_en}
        if energies is not None and t.w_align > 0:
            log_probs = jax.nn.log_softmax(energies, axis=-1)
            loss_align = align_ops.forward_sum_loss(
                log_probs, batch["text_lengths"], batch["frame_lengths"])
            loss = loss + t.w_align * loss_align
            aux["align"] = loss_align

        m = self.cfg.model
        if t.w_spk > 0:
            # Speaker-contrastive InfoNCE on the prompt-encoder summary —
            # the prompt encoder's ONLY gradient in the whole pipeline (see
            # TrainConfig.w_spk).  Positive pair: this utterance's mel vs
            # its same-speaker reference mel; negatives: the rest of the
            # batch (each batch item is a distinct synthetic speaker).
            # Directly optimizes what pipelines/eval.speaker_similarity_margin
            # measures (obligation: /root/reference/README.md:5 A1/A6).
            ref_mel = stft_ops.mel_spectrogram(batch["ref_wav"], m.audio)
            _, e_ref = self.acoustic.apply(g_params["acoustic"], ref_mel,
                                           method=StyleTTSZS.encode_prompt)
            _, e_utt = self.acoustic.apply(g_params["acoustic"], mel_gt,
                                           frame_mask,
                                           method=StyleTTSZS.encode_prompt)
            za, zb = _l2normalize(e_utt), _l2normalize(e_ref)
            labels = jnp.arange(za.shape[0])
            ce = optax.softmax_cross_entropy_with_integer_labels

            def nce(x, y):
                lg = (x @ y.T) / t.spk_tau
                return (0.5 * (ce(lg, labels).mean()
                               + ce(lg.T, labels).mean()), lg)

            loss_spk, logits = nce(za, zb)
            loss = loss + t.w_spk * loss_spk
            aux["spk_nce"] = loss_spk
            aux["spk_acc"] = jnp.mean(
                (jnp.argmax(logits, axis=1) == labels).astype(jnp.float32))
            # Speaker cycle-consistency views (TrainConfig.w_spk_rec/_voc):
            # the SYNTHESIZED signal must embed next to its speaker's
            # reference too — gradients flow through the decoder (rec view)
            # and the vocoder (voc view), directly optimizing the pathway
            # pipelines/eval.speaker_similarity_margin measures.
            # The synthesized views anchor against a FROZEN copy of the
            # real-reference embedding: without the stop_gradient the views
            # can pull the real-audio embedding toward early-training
            # garbage mels / decoder artifacts (embedding-decoder
            # co-adaptation), which would also let the pair game the
            # similarity metric rather than preserve timbre (ADVICE r4).
            zb_sg = jax.lax.stop_gradient(zb)
            if t.w_spk_rec > 0:
                _, e_rec = self.acoustic.apply(
                    g_params["acoustic"], out.mel, frame_mask,
                    method=StyleTTSZS.encode_prompt)
                loss_rec, _ = nce(_l2normalize(e_rec), zb_sg)
                loss = loss + t.w_spk_rec * loss_rec
                aux["spk_nce_rec"] = loss_rec
            if t.w_spk_voc > 0:
                mel_voc = stft_ops.mel_spectrogram(wav_fake, m.audio)
                Tv = min(mel_voc.shape[1], frame_mask.shape[1])
                _, e_voc = self.acoustic.apply(
                    g_params["acoustic"], mel_voc[:, :Tv],
                    frame_mask[:, :Tv], method=StyleTTSZS.encode_prompt)
                loss_voc, _ = nce(_l2normalize(e_voc), zb_sg)
                loss = loss + t.w_spk_voc * loss_voc
                aux["spk_nce_voc"] = loss_voc
        if t.w_fsq_entropy > 0:
            # FSQ usage-entropy bonus on the pre-quantizer projection (see
            # TrainConfig.w_fsq_entropy; ops/fsq.entropy_losses docstring).
            # Recomputes extractor+down on the same (params, mel) as
            # reconstruct() above — XLA CSE dedupes the duplicate subgraph.
            def _style_z(mdl, mel, fmask):
                return mdl.quantizer.down(mdl.style_extractor(mel, mask=fmask))
            z = self.acoustic.apply(g_params["acoustic"], mel_gt, frame_mask,
                                    method=_style_z)
            ent_s, ent_c = fsq_ops.entropy_losses(z, m.style.fsq_levels)
            loss = loss + t.w_fsq_entropy * (ent_s - ent_c)
            aux["fsq_sample_ent"] = ent_s
            aux["fsq_code_ent"] = ent_c
        aux["total_g"] = loss
        return loss, aux

    def d_loss(self, d_params, g_params, batch, rng):
        out, wav_hat, mel_gt, _, frame_mask, _, _ = self._forward_g(
            g_params, batch, rng)
        L = min(wav_hat.shape[1], batch["wav"].shape[1])
        wav_gt = batch["wav"][:, :L]
        wav_fake = jax.lax.stop_gradient(wav_hat[:, :L])
        mel_fake = jax.lax.stop_gradient(out.mel)
        fake_lg, _ = self.discriminator.apply(d_params, wav_fake, mel_fake)
        real_lg, _ = self.discriminator.apply(d_params, wav_gt, mel_gt)
        loss = discriminator_loss(real_lg, fake_lg)
        return loss, {"total_d": loss}

    @functools.partial(jax.jit, static_argnames=("self",), donate_argnums=(1,))
    def train_step(self, state: TrainState, batch, rng):
        rng_g, rng_d = jax.random.split(rng)
        (gl, g_aux), g_grads = jax.value_and_grad(self.g_loss, has_aux=True)(
            state.g_params, state.d_params, batch, rng_g)
        g_updates, g_opt = self.g_tx.update(g_grads, state.g_opt,
                                            state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        (dl, d_aux), d_grads = jax.value_and_grad(self.d_loss, has_aux=True)(
            state.d_params, g_params, batch, rng_d)
        d_updates, d_opt = self.d_tx.update(d_grads, state.d_opt,
                                            state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        ema = jax.tree.map(
            lambda e, p: e * self.cfg.train.ema_decay
            + p * (1.0 - self.cfg.train.ema_decay),
            state.ema_params, g_params)
        new_state = TrainState(state.step + 1, g_params, d_params, g_opt,
                               d_opt, ema)
        metrics = {**g_aux, **d_aux}
        return new_state, metrics


# ---------------------------------------------------------------------------
# stage 2: style latent diffusion (SURVEY.md §3.4)
# ---------------------------------------------------------------------------

class Stage2Trainer:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.acoustic, self.diffusion, _, _ = build_models(cfg)
        self.tx = make_optimizer(cfg)

    def init_state(self, diffusion_params):
        diffusion_params = jax.tree.map(jnp.array, diffusion_params)
        return {"step": jnp.zeros((), jnp.int32),
                "params": diffusion_params,
                "opt": self.tx.init(diffusion_params),
                "ema": jax.tree.map(jnp.array, diffusion_params)}

    def loss(self, params, acoustic_params, batch, rng):
        """Frozen stage-1 encoders produce targets + conditioning."""
        m = self.cfg.model
        rng_drop, rng_diff = jax.random.split(rng)
        mel_gt = stft_ops.mel_spectrogram(batch["wav"], m.audio)
        n_frames = batch["f0"].shape[1]
        mel_gt = mel_gt[:, :n_frames]
        text_mask = length_mask(batch["text_lengths"],
                                batch["phonemes"].shape[1])
        frame_mask = length_mask(batch["frame_lengths"], n_frames)

        styled, _, _ = self.acoustic.apply(
            acoustic_params, mel_gt, frame_mask,
            method=StyleTTSZS.extract_style)
        styled = jax.lax.stop_gradient(styled)

        ref_mel = stft_ops.mel_spectrogram(batch["ref_wav"], m.audio)
        tokens, summary = self.acoustic.apply(
            acoustic_params, ref_mel, method=StyleTTSZS.encode_prompt)
        text_enc, _ = self.acoustic.apply(
            acoustic_params, batch["phonemes"], text_mask,
            method=StyleTTSZS.encode_text)
        tokens = jax.lax.stop_gradient(tokens)
        summary = jax.lax.stop_gradient(summary)
        text_enc = jax.lax.stop_gradient(text_enc)

        drop = jax.random.bernoulli(
            rng_drop, m.diffusion.cond_dropout, (styled.shape[0],))
        loss, _ = self.diffusion.apply(
            params, styled, text_enc, tokens, summary, text_mask=text_mask,
            rng=rng_diff, drop_prompt=drop)
        return loss, {"diff": loss}

    @functools.partial(jax.jit, static_argnames=("self",), donate_argnums=(1,))
    def train_step(self, state, acoustic_params, batch, rng):
        (l, aux), grads = jax.value_and_grad(self.loss, has_aux=True)(
            state["params"], acoustic_params, batch, rng)
        updates, opt = self.tx.update(grads, state["opt"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        ema = jax.tree.map(
            lambda e, p: e * self.cfg.train.ema_decay
            + p * (1.0 - self.cfg.train.ema_decay), state["ema"], params)
        return {"step": state["step"] + 1, "params": params, "opt": opt,
                "ema": ema}, aux


# ---------------------------------------------------------------------------
# stage 3: 1-step distillation with perceptual loss (SURVEY.md §3.5)
# ---------------------------------------------------------------------------

class Stage3Trainer:
    """Teacher = frozen stage-2 sampler; student init = teacher; the student's
    single CFG call must reproduce the teacher's multi-step trajectory end
    point, judged in latent space AND perceptually through the frozen decoder
    (A7: "distilled with perceptual loss ... reducing inference speed by 90%").
    """

    def __init__(self, cfg: Config, *, n_teacher_steps: Optional[int] = None):
        self.cfg = cfg
        self.acoustic, self.diffusion, _, _ = build_models(cfg)
        self.tx = make_optimizer(cfg)
        self.n_teacher_steps = n_teacher_steps or cfg.model.diffusion.n_steps

    def init_state(self, teacher_params):
        # student starts from a COPY of the teacher (teacher is passed
        # separately each step and must not alias donated student buffers)
        student = jax.tree.map(jnp.array, teacher_params)
        return {"step": jnp.zeros((), jnp.int32),
                "params": student,
                "opt": self.tx.init(student)}

    def loss(self, student_params, teacher_params, acoustic_params, batch,
             rng):
        m = self.cfg.model
        t = self.cfg.train
        text_mask = length_mask(batch["text_lengths"],
                                batch["phonemes"].shape[1])
        ref_mel = stft_ops.mel_spectrogram(batch["ref_wav"], m.audio)
        tokens, summary = self.acoustic.apply(
            acoustic_params, ref_mel, method=StyleTTSZS.encode_prompt)
        text_enc, _ = self.acoustic.apply(
            acoustic_params, batch["phonemes"], text_mask,
            method=StyleTTSZS.encode_text)

        # identical initial noise: both samplers draw with the same rng and
        # start at sigma_max
        s_teacher = self.diffusion.apply(
            teacher_params, rng, text_enc, tokens, summary,
            text_mask=text_mask, n_steps=self.n_teacher_steps,
            method=StyleDiffusion.sample)
        s_teacher = jax.lax.stop_gradient(s_teacher)
        s_student = self.diffusion.apply(
            student_params, rng, text_enc, tokens, summary,
            text_mask=text_mask, method=StyleDiffusion.sample_onestep)

        loss_latent = jnp.mean(
            (s_student.astype(jnp.float32)
             - s_teacher.astype(jnp.float32)) ** 2)

        # perceptual: decode both through the frozen acoustic stack
        def decode(style):
            styled = self.acoustic.apply(acoustic_params, style,
                                         method=StyleTTSZS.quantize_style)
            out = self.acoustic.apply(
                acoustic_params, batch["phonemes"], styled,
                text_mask=text_mask, n_frames=batch["f0"].shape[1],
                method=StyleTTSZS.text_to_mel)
            return out.mel, out.frame_mask

        mel_t, fm = decode(s_teacher)
        mel_s, _ = decode(s_student)
        mel_t = jax.lax.stop_gradient(mel_t)
        loss_perc = _masked_l1_feat(mel_s, mel_t, fm)

        loss = t.w_latent * loss_latent + t.w_perceptual * loss_perc
        return loss, {"latent": loss_latent, "perceptual": loss_perc,
                      "total_distill": loss}

    @functools.partial(jax.jit, static_argnames=("self",), donate_argnums=(1,))
    def train_step(self, state, teacher_params, acoustic_params, batch, rng):
        (l, aux), grads = jax.value_and_grad(self.loss, has_aux=True)(
            state["params"], teacher_params, acoustic_params, batch, rng)
        updates, opt = self.tx.update(grads, state["opt"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        return {"step": state["step"] + 1, "params": params, "opt": opt}, aux


def batch_to_device(batch, sharding=None):
    """numpy Batch dataclass (or featurized dict) -> (sharded) device dict."""
    src = batch if isinstance(batch, dict) else vars(batch)
    d = {k: src[k] for k in ("phonemes", "text_lengths", "durations", "wav",
                             "f0", "energy", "frame_lengths", "ref_wav")}
    if sharding is not None:
        return {k: jax.device_put(v, sharding) for k, v in d.items()}
    return {k: jnp.asarray(v) for k, v in d.items()}
