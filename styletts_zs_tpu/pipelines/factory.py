"""Model factory: build modules + init full parameter trees from a Config."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from styletts_zs_tpu.models.diffusion import StyleDiffusion
from styletts_zs_tpu.models.discriminators import MultiModalDiscriminator
from styletts_zs_tpu.models.tts import StyleTTSZS
from styletts_zs_tpu.models.vocoder import Vocoder
from styletts_zs_tpu.utils.config import Config


def compute_dtype(cfg: Config) -> jnp.dtype:
    return jnp.dtype(cfg.runtime.compute_dtype)


def build_models(cfg: Config):
    m, r = cfg.model, cfg.runtime
    dt = compute_dtype(cfg)
    acoustic = StyleTTSZS(m, use_pallas=r.use_pallas, dtype=dt)
    # diffusion runs at its own (fp32) dtype — see RuntimeConfig.diffusion_dtype
    diffusion = StyleDiffusion(m.diffusion, m.style, ctx_dim=m.text_encoder.dim,
                               use_pallas=r.use_pallas,
                               dtype=jnp.dtype(r.diffusion_dtype))
    vocoder = Vocoder(m.vocoder, n_mels=m.audio.n_mels,
                      use_pallas=r.use_pallas, dtype=dt)
    discriminator = MultiModalDiscriminator(m.discriminator, dtype=dt)
    return acoustic, diffusion, vocoder, discriminator


def init_params(cfg: Config, rng: jax.Array, *, with_discriminator: bool = False,
                batch: int = 2):
    """Initialize every param tree (host-side, fp32 params)."""
    m = cfg.model
    acoustic, diffusion, vocoder, discriminator = build_models(cfg)
    r_ac, r_df, r_vo, r_di, r_s = jax.random.split(rng, 5)

    Tt = min(16, m.max_text_len)
    Tf = min(64, m.max_frames)
    phonemes = jnp.ones((batch, Tt), jnp.int32)
    mel = jnp.zeros((batch, Tf, m.audio.n_mels))
    ref_mel = jnp.zeros((batch, 32, m.audio.n_mels))
    durations = jnp.full((batch, Tt), Tf // Tt, jnp.int32)
    p_ac = acoustic.init(r_ac, phonemes, mel, ref_mel, durations,
                         method=StyleTTSZS.init_all)

    target = jnp.zeros((batch, m.style.n_codes, m.style.d_style))
    text_enc = jnp.zeros((batch, Tt, m.text_encoder.dim))
    tokens = jnp.zeros((batch, m.prompt_encoder.n_prompt_tokens,
                        m.text_encoder.dim))
    summary = jnp.zeros((batch, m.text_encoder.dim))
    p_df = diffusion.init(r_df, target, text_enc, tokens, summary, r_s,
                          method=StyleDiffusion.init_all)

    p_vo = vocoder.init(r_vo, mel)
    params = {"acoustic": p_ac, "diffusion": p_df, "vocoder": p_vo}
    if with_discriminator:
        up = 1
        for rate in m.vocoder.upsample_rates:
            up *= rate
        wav = jnp.zeros((batch, (Tf * up - 1) * m.vocoder.istft_hop))
        params["discriminator"] = discriminator.init(r_di, wav, mel)
    return params


def param_count(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
