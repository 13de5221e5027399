"""Vocoder, diffusion sampler, and discriminator tests (tiny config)."""
import jax
import numpy as np
import pytest

from styletts_zs_tpu.models.diffusion import StyleDiffusion, karras_sigmas
from styletts_zs_tpu.models.discriminators import (
    MultiModalDiscriminator, discriminator_loss, feature_matching_loss,
    generator_adv_loss)
from styletts_zs_tpu.models.vocoder import Vocoder
from styletts_zs_tpu.utils.config import tiny_test_config

CFG = tiny_test_config().model


def test_vocoder_output_shape():
    model = Vocoder(CFG.vocoder, n_mels=CFG.audio.n_mels)
    rng = jax.random.PRNGKey(0)
    mel = jax.random.normal(rng, (2, 16, CFG.audio.n_mels))
    params = model.init(rng, mel)
    wav = model.apply(params, mel)
    up = 1
    for r in CFG.vocoder.upsample_rates:
        up *= r
    expect = (16 * up - 1) * CFG.vocoder.istft_hop
    assert wav.shape == (2, expect)
    assert np.isfinite(np.asarray(wav)).all()


def test_karras_schedule_monotone():
    s = karras_sigmas(CFG.diffusion, 8)
    assert len(s) == 9
    assert s[-1] == 0.0
    assert (np.diff(s) < 0).all()


@pytest.fixture(scope="module")
def diffusion_setup():
    model = StyleDiffusion(CFG.diffusion, CFG.style,
                           ctx_dim=CFG.text_encoder.dim)
    rng = jax.random.PRNGKey(0)
    B, Tt, K = 2, 16, CFG.style.n_codes
    target = jax.random.normal(rng, (B, K, CFG.style.d_style)) * 0.5
    text_enc = jax.random.normal(rng, (B, Tt, CFG.text_encoder.dim))
    prompt_tokens = jax.random.normal(
        rng, (B, 4, CFG.text_encoder.dim))
    prompt_summary = jax.random.normal(rng, (B, CFG.text_encoder.dim))
    params = model.init(rng, target, text_enc, prompt_tokens, prompt_summary,
                        jax.random.PRNGKey(1),
                        method=StyleDiffusion.init_all)
    # AdaLN modulation is zero-init (DiT): perturb all params so conditioning
    # actually flows, letting the CFG test observe guidance.
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    leaves = [p + 0.05 * jax.random.normal(k, p.shape, p.dtype)
              for p, k in zip(leaves, keys)]
    params = jax.tree.unflatten(treedef, leaves)
    return model, params, (target, text_enc, prompt_tokens, prompt_summary)


def test_diffusion_loss_finite(diffusion_setup):
    model, params, (target, text_enc, pt, ps) = diffusion_setup
    loss, aux = model.apply(params, target, text_enc, pt, ps,
                            rng=jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))


def test_multistep_sampler_shape(diffusion_setup):
    model, params, (target, text_enc, pt, ps) = diffusion_setup
    out = model.apply(params, jax.random.PRNGKey(3), text_enc, pt, ps,
                      n_steps=4, method=StyleDiffusion.sample)
    assert out.shape == target.shape
    assert np.isfinite(np.asarray(out)).all()


def test_onestep_sampler_shape(diffusion_setup):
    model, params, (target, text_enc, pt, ps) = diffusion_setup
    out = model.apply(params, jax.random.PRNGKey(3), text_enc, pt, ps,
                      method=StyleDiffusion.sample_onestep)
    assert out.shape == target.shape
    assert np.isfinite(np.asarray(out)).all()


def test_cfg_guidance_changes_sample(diffusion_setup):
    model, params, (target, text_enc, pt, ps) = diffusion_setup
    a = model.apply(params, jax.random.PRNGKey(3), text_enc, pt, ps,
                    n_steps=2, guidance=1.0, method=StyleDiffusion.sample)
    b = model.apply(params, jax.random.PRNGKey(3), text_enc, pt, ps,
                    n_steps=2, guidance=4.0, method=StyleDiffusion.sample)
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6


def test_discriminators_and_losses():
    model = MultiModalDiscriminator(CFG.discriminator)
    rng = jax.random.PRNGKey(0)
    wav = jax.random.normal(rng, (2, 4000))
    mel = jax.random.normal(rng, (2, 32, CFG.audio.n_mels))
    params = model.init(rng, wav, mel)
    real_lg, real_ft = model.apply(params, wav, mel)
    fake_lg, fake_ft = model.apply(params, wav * 0.5, mel * 0.5)
    n_critics = (len(CFG.discriminator.mpd_periods)
                 + len(CFG.discriminator.mrd_ffts) + 1)
    assert len(real_lg) == n_critics
    d = discriminator_loss(real_lg, fake_lg)
    g = generator_adv_loss(fake_lg)
    fm = feature_matching_loss(real_ft, fake_ft)
    for v in (d, g, fm):
        assert np.isfinite(float(v))
