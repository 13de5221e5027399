"""Module golden tests: frozen-seed output snapshots (SURVEY.md §4.2).

First run writes `tests/goldens/*.npz` (committed); later runs must match
within fp32 tolerance — catches unintended numerics changes in refactors.
Regenerate intentionally with STYLETTS_REGEN_GOLDENS=1.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
REGEN = bool(os.environ.get("STYLETTS_REGEN_GOLDENS"))


def _check(name: str, value: np.ndarray, atol=2e-4, rtol=2e-4):
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    value = np.asarray(value, np.float32)
    if REGEN or not os.path.exists(path):
        np.savez_compressed(path, value=value)
        pytest.skip(f"golden {name} written")
    ref = np.load(path)["value"]
    np.testing.assert_allclose(value, ref, atol=atol, rtol=rtol,
                               err_msg=f"golden drift: {name}")


def test_golden_mel_frontend():
    from styletts_zs_tpu.ops import stft as S
    from styletts_zs_tpu.utils.config import AudioConfig
    cfg = AudioConfig(n_fft=512, win_length=400, hop_length=100, n_mels=40,
                      fmax=8000.0)
    rng = np.random.default_rng(1234)
    wav = jnp.asarray(rng.standard_normal((1, 2000)).astype(np.float32) * 0.3)
    _check("mel_frontend", S.mel_spectrogram(wav, cfg))


def test_golden_acoustic_forward():
    from styletts_zs_tpu.models.tts import StyleTTSZS
    from styletts_zs_tpu.utils.config import tiny_test_config
    cfg = tiny_test_config().model
    model = StyleTTSZS(cfg)
    rng = jax.random.PRNGKey(42)
    phonemes = jax.random.randint(rng, (1, 16), 1, 40)
    mel = jax.random.normal(rng, (1, 64, cfg.audio.n_mels))
    ref_mel = jax.random.normal(rng, (1, 32, cfg.audio.n_mels))
    durations = jnp.full((1, 16), 4, jnp.int32)
    params = model.init(rng, phonemes, mel, ref_mel, durations,
                        method=StyleTTSZS.init_all)
    style = jnp.zeros((1, cfg.style.n_codes, cfg.style.d_style))
    out = model.apply(params, phonemes, style, n_frames=64,
                      method=StyleTTSZS.text_to_mel)
    _check("acoustic_mel", out.mel)
    _check("acoustic_f0", out.f0)


def test_golden_diffusion_sample():
    from styletts_zs_tpu.models.diffusion import StyleDiffusion
    from styletts_zs_tpu.utils.config import tiny_test_config
    cfg = tiny_test_config().model
    model = StyleDiffusion(cfg.diffusion, cfg.style,
                           ctx_dim=cfg.text_encoder.dim)
    rng = jax.random.PRNGKey(7)
    target = jax.random.normal(rng, (1, cfg.style.n_codes, cfg.style.d_style))
    text_enc = jax.random.normal(rng, (1, 16, cfg.text_encoder.dim))
    tokens = jax.random.normal(rng, (1, 4, cfg.text_encoder.dim))
    summary = jax.random.normal(rng, (1, cfg.text_encoder.dim))
    params = model.init(rng, target, text_enc, tokens, summary,
                        jax.random.PRNGKey(1),
                        method=StyleDiffusion.init_all)
    out = model.apply(params, jax.random.PRNGKey(3), text_enc, tokens,
                      summary, n_steps=4, method=StyleDiffusion.sample)
    _check("diffusion_sample", out)
