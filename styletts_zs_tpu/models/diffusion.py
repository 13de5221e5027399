"""Time-varying style diffusion: denoiser, multi-step sampler, 1-step student.

Claims A2/A5/A6/A7 of ``/root/reference/README.md:5``: a latent diffusion
model over the K fixed-length style vectors, conditioned on text and on the
zero-shot speaker prompt, sampled with classifier-free guidance; plus the
distilled 1-step path.  EDM-style preconditioning/schedule (Karras sigmas).

TPU-first obligations (``BASELINE.json:5``): the whole sampling loop is ONE
jitted ``lax.scan`` — control never leaves the device (SURVEY.md §3.2) — and
the CFG pair runs as a single doubled batch through the denoiser each step
("CFG doubling fused into the sampler"), not two forward passes.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from styletts_zs_tpu.models.layers import (AdaLNTransformerBlock, MLP,
                                           sinusoidal_embedding)
from styletts_zs_tpu.utils.config import DiffusionConfig, StyleConfig


def karras_sigmas(cfg: DiffusionConfig, n_steps: int) -> np.ndarray:
    """Karras et al. noise schedule, length n_steps+1 (last = 0)."""
    i = np.arange(n_steps, dtype=np.float64)
    inv_rho = 1.0 / cfg.rho
    s = (cfg.sigma_max ** inv_rho
         + i / max(n_steps - 1, 1) * (cfg.sigma_min ** inv_rho
                                      - cfg.sigma_max ** inv_rho)) ** cfg.rho
    return np.concatenate([s, [0.0]]).astype(np.float32)


class StyleDenoiser(nn.Module):
    """Transformer denoiser over the (B, K, d_style) style latents.

    Conditioning: sigma (Fourier features) + prompt summary via AdaLN;
    text encodings + prompt tokens via cross-attention.  EDM preconditioning
    wraps the raw network F into the denoiser D.
    """

    cfg: DiffusionConfig
    style_cfg: StyleConfig
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def raw(self, x: jax.Array, c_noise: jax.Array, ctx: jax.Array,
            ctx_mask: Optional[jax.Array], prompt_summary: jax.Array) -> jax.Array:
        """F(x; sigma, cond): (B, K, d_style) -> (B, K, d_style)."""
        c = self.cfg
        B, K, _ = x.shape
        h = nn.Dense(c.dim, dtype=self.dtype, name="in_proj")(x)
        h = h + sinusoidal_embedding(jnp.arange(K), c.dim)[None].astype(self.dtype)
        t_emb = sinusoidal_embedding(c_noise * 1000.0, c.dim)  # (B, dim)
        cond = MLP(c.dim, expand=2, dtype=self.dtype, name="t_mlp")(
            t_emb.astype(self.dtype))
        cond = cond + nn.Dense(c.dim, dtype=self.dtype, name="prompt_proj")(
            prompt_summary)
        for i in range(c.n_layers):
            h = AdaLNTransformerBlock(c.dim, c.n_heads, cross=True,
                                      use_pallas=self.use_pallas,
                                      dtype=self.dtype, name=f"block{i}")(
                h, cond, ctx=ctx, ctx_mask=ctx_mask)
        h = nn.LayerNorm(dtype=self.dtype)(h)
        return nn.Dense(self.style_cfg.d_style, dtype=self.dtype,
                        name="out_proj")(h)

    def __call__(self, x_sigma: jax.Array, sigma: jax.Array, ctx: jax.Array,
                 ctx_mask: Optional[jax.Array],
                 prompt_summary: jax.Array) -> jax.Array:
        """EDM-preconditioned denoiser D(x; sigma) ~ E[x0 | x_sigma].

        sigma: (B,) noise levels.
        """
        c = self.cfg
        sd = c.sigma_data
        sigma = sigma.astype(jnp.float32)
        s2 = sigma ** 2
        c_skip = (sd ** 2 / (s2 + sd ** 2))[:, None, None]
        c_out = (sigma * sd / jnp.sqrt(s2 + sd ** 2))[:, None, None]
        c_in = (1.0 / jnp.sqrt(s2 + sd ** 2))[:, None, None]
        c_noise = jnp.log(jnp.maximum(sigma, 1e-8)) / 4.0
        f = self.raw((c_in * x_sigma.astype(jnp.float32)).astype(self.dtype),
                     c_noise, ctx, ctx_mask, prompt_summary)
        return (c_skip * x_sigma.astype(jnp.float32)
                + c_out * f.astype(jnp.float32))


class StyleDiffusion(nn.Module):
    """Denoiser + samplers + CFG machinery (null-conditioning embeddings)."""

    cfg: DiffusionConfig
    style_cfg: StyleConfig
    ctx_dim: int = 512
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.denoiser = StyleDenoiser(self.cfg, self.style_cfg,
                                      use_pallas=self.use_pallas,
                                      dtype=self.dtype)
        # learned null conditioning for CFG (A6): replaces prompt when dropped
        self.null_prompt_summary = self.param(
            "null_prompt_summary", nn.initializers.zeros, (self.ctx_dim,),
            jnp.float32)
        self.null_prompt_tokens = self.param(
            "null_prompt_tokens", nn.initializers.zeros, (1, self.ctx_dim),
            jnp.float32)

    def _context(self, text_enc, prompt_tokens, text_mask, drop_prompt=None):
        """Concatenate [text; prompt] context; optionally null the prompt.

        drop_prompt: (B,) bool — True replaces prompt tokens/summary with the
        learned nulls (training-time CFG dropout and the uncond branch).
        """
        B = text_enc.shape[0]
        P = prompt_tokens.shape[1]
        null_tok = jnp.broadcast_to(
            self.null_prompt_tokens[None].astype(prompt_tokens.dtype),
            (B, P, prompt_tokens.shape[-1]))
        if drop_prompt is not None:
            sel = drop_prompt[:, None, None]
            prompt_tokens = jnp.where(sel, null_tok, prompt_tokens)
        ctx = jnp.concatenate([text_enc, prompt_tokens], axis=1)
        if text_mask is not None:
            pm = jnp.ones((B, P), dtype=bool)
            ctx_mask = jnp.concatenate([text_mask, pm], axis=1)
        else:
            ctx_mask = None
        return ctx, ctx_mask

    def _summary(self, prompt_summary, drop_prompt=None):
        if drop_prompt is None:
            return prompt_summary
        null = jnp.broadcast_to(
            self.null_prompt_summary[None].astype(prompt_summary.dtype),
            prompt_summary.shape)
        return jnp.where(drop_prompt[:, None], null, prompt_summary)

    # ------------------------------------------------------------------
    # training
    # ------------------------------------------------------------------

    def __call__(self, style_target, text_enc, prompt_tokens, prompt_summary,
                 *, text_mask=None, rng=None, drop_prompt=None):
        """Denoising-loss forward (SURVEY.md §3.4): returns (loss, aux).

        style_target: (B, K, d_style) clean latents from the frozen extractor.
        """
        c = self.cfg
        B = style_target.shape[0]
        rng_t, rng_n = jax.random.split(rng)
        # EDM log-normal sigma sampling
        ln_sigma = jax.random.normal(rng_t, (B,)) * 1.2 - 1.2
        sigma = jnp.exp(ln_sigma) * c.sigma_data / 0.5
        noise = jax.random.normal(rng_n, style_target.shape, jnp.float32)
        x_sigma = style_target.astype(jnp.float32) + sigma[:, None, None] * noise

        ctx, ctx_mask = self._context(text_enc, prompt_tokens, text_mask,
                                      drop_prompt)
        summary = self._summary(prompt_summary, drop_prompt)
        denoised = self.denoiser(x_sigma, sigma, ctx, ctx_mask, summary)
        # EDM loss weight: (sigma^2 + sd^2) / (sigma * sd)^2
        sd = c.sigma_data
        w = ((sigma ** 2 + sd ** 2) / (sigma * sd) ** 2)[:, None, None]
        loss = jnp.mean(w * (denoised - style_target.astype(jnp.float32)) ** 2)
        return loss, {"sigma": sigma, "denoised": denoised}

    # ------------------------------------------------------------------
    # sampling
    # ------------------------------------------------------------------

    def _denoise_pair(self, x, sigma_scalar, ctx2, ctx_mask2, summary2):
        """One CFG-doubled denoiser call (fused batch, BASELINE.json:5).

        x: (B, K, d); the doubled tensors stack [cond | uncond] on batch.
        Returns (d_cond, d_uncond).
        """
        B = x.shape[0]
        x2 = jnp.concatenate([x, x], axis=0)
        sig2 = jnp.full((2 * B,), sigma_scalar, jnp.float32)
        den2 = self.denoiser(x2, sig2, ctx2, ctx_mask2, summary2)
        return den2[:B], den2[B:]

    def _cfg_denoise(self, x, sigma_scalar, ctx2, ctx_mask2, summary2,
                     guidance: float):
        d_cond, d_uncond = self._denoise_pair(x, sigma_scalar, ctx2,
                                              ctx_mask2, summary2)
        return d_uncond + guidance * (d_cond - d_uncond)

    def sample(self, rng, text_enc, prompt_tokens, prompt_summary, *,
               text_mask=None, n_steps: Optional[int] = None,
               guidance: Optional[float] = None) -> jax.Array:
        """Multi-step Heun sampler (config 3, ``BASELINE.json:9``).

        One ``lax.scan`` over the Karras schedule; the CFG pair is a fused
        doubled batch inside each step.  Returns (B, K, d_style).
        """
        c = self.cfg
        n_steps = n_steps or c.n_steps
        guidance = c.cfg_scale if guidance is None else guidance
        B, K, d = text_enc.shape[0], self.style_cfg.n_codes, self.style_cfg.d_style

        drop = jnp.zeros((B,), bool)
        full = jnp.ones((B,), bool)
        ctx_c, mask_c = self._context(text_enc, prompt_tokens, text_mask, drop)
        ctx_u, mask_u = self._context(text_enc, prompt_tokens, text_mask, full)
        ctx2 = jnp.concatenate([ctx_c, ctx_u], axis=0)
        ctx_mask2 = (None if mask_c is None
                     else jnp.concatenate([mask_c, mask_u], axis=0))
        summary2 = jnp.concatenate(
            [self._summary(prompt_summary, drop),
             self._summary(prompt_summary, full)], axis=0)

        sigmas = jnp.asarray(karras_sigmas(c, n_steps))
        x = jax.random.normal(rng, (B, K, d), jnp.float32) * sigmas[0]

        use_fused = self.use_pallas
        g = float(guidance)

        def heun_step(x, i):
            s_cur, s_next = sigmas[i], sigmas[i + 1]
            dc, du = self._denoise_pair(x, s_cur, ctx2, ctx_mask2, summary2)
            if use_fused:
                # fused guidance + score + Euler update (sampler-step kernel)
                from styletts_zs_tpu.kernels import sampler_kernel
                x_euler, d_cur = sampler_kernel.fused_euler_step(
                    x, dc, du, s_cur, s_next, guidance=g)
            else:
                den = du + g * (dc - du)
                d_cur = (x - den) / s_cur
                x_euler = x + (s_next - s_cur) * d_cur

            # 2nd-order correction (skipped on final step where s_next = 0)
            def correct(_):
                dc2, du2 = self._denoise_pair(x_euler, s_next, ctx2,
                                              ctx_mask2, summary2)
                if use_fused:
                    from styletts_zs_tpu.kernels import sampler_kernel
                    return sampler_kernel.fused_heun_correction(
                        x, x_euler, dc2, du2, d_cur, s_cur, s_next,
                        guidance=g)
                den2 = du2 + g * (dc2 - du2)
                d_next = (x_euler - den2) / jnp.maximum(s_next, 1e-8)
                return x + (s_next - s_cur) * 0.5 * (d_cur + d_next)
            x_new = jax.lax.cond(s_next > 0, correct, lambda _: x_euler,
                                 operand=None)
            return x_new, None

        x, _ = jax.lax.scan(heun_step, x, jnp.arange(n_steps))
        return x.astype(self.dtype)

    def sample_onestep(self, rng, text_enc, prompt_tokens, prompt_summary, *,
                       text_mask=None, guidance: Optional[float] = None) -> jax.Array:
        """Distilled 1-step path (A7; config 2, ``BASELINE.json:8``).

        Single CFG-doubled denoiser call at sigma_max — the student is
        trained (stage 3) so that this one call matches the teacher's
        multi-step output.
        """
        c = self.cfg
        guidance = c.cfg_scale if guidance is None else guidance
        B, K, d = text_enc.shape[0], self.style_cfg.n_codes, self.style_cfg.d_style
        drop = jnp.zeros((B,), bool)
        full = jnp.ones((B,), bool)
        ctx_c, mask_c = self._context(text_enc, prompt_tokens, text_mask, drop)
        ctx_u, mask_u = self._context(text_enc, prompt_tokens, text_mask, full)
        ctx2 = jnp.concatenate([ctx_c, ctx_u], axis=0)
        ctx_mask2 = (None if mask_c is None
                     else jnp.concatenate([mask_c, mask_u], axis=0))
        summary2 = jnp.concatenate(
            [self._summary(prompt_summary, drop),
             self._summary(prompt_summary, full)], axis=0)
        x = jax.random.normal(rng, (B, K, d), jnp.float32) * c.sigma_max
        den = self._cfg_denoise(x, jnp.float32(c.sigma_max), ctx2, ctx_mask2,
                                summary2, guidance)
        return den.astype(self.dtype)

    def init_all(self, style_target, text_enc, prompt_tokens, prompt_summary,
                 rng):
        loss, _ = self(style_target, text_enc, prompt_tokens, prompt_summary,
                       rng=rng, drop_prompt=jnp.zeros((style_target.shape[0],), bool))
        return loss
