"""End-to-end slice tests: acceptance config 1 (text -> mel, fixed style)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from styletts_zs_tpu.models.tts import StyleTTSZS
from styletts_zs_tpu.ops import align
from styletts_zs_tpu.utils.config import tiny_test_config


@pytest.fixture(scope="module")
def model_and_params():
    cfg = tiny_test_config().model
    model = StyleTTSZS(cfg)
    rng = jax.random.PRNGKey(0)
    B, Tt, Tf = 2, 16, 64
    phonemes = jax.random.randint(rng, (B, Tt), 1, cfg.text_encoder.vocab_size)
    mel = jax.random.normal(rng, (B, Tf, cfg.audio.n_mels))
    ref_mel = jax.random.normal(rng, (B, 32, cfg.audio.n_mels))
    durations = jnp.full((B, Tt), Tf // Tt, dtype=jnp.int32)
    params = model.init(rng, phonemes, mel, ref_mel, durations,
                        method=StyleTTSZS.init_all)
    return cfg, model, params


def test_text_to_mel_shapes(model_and_params):
    cfg, model, params = model_and_params
    B, Tt, K = 2, 16, cfg.style.n_codes
    phonemes = jnp.ones((B, Tt), dtype=jnp.int32)
    style = jnp.zeros((B, K, cfg.style.d_style))
    out = model.apply(params, phonemes, style, n_frames=64,
                      method=StyleTTSZS.text_to_mel)
    assert out.mel.shape == (B, 64, cfg.audio.n_mels)
    assert out.f0.shape == (B, 64)
    assert out.durations.shape == (B, Tt)
    assert np.isfinite(np.asarray(out.mel)).all()


def test_deterministic_repeatable(model_and_params):
    """Config 1 requires a deterministic path (BASELINE.json:7)."""
    cfg, model, params = model_and_params
    phonemes = jnp.ones((2, 16), dtype=jnp.int32)
    style = jnp.zeros((2, cfg.style.n_codes, cfg.style.d_style))
    m1 = model.apply(params, phonemes, style, n_frames=64,
                     method=StyleTTSZS.text_to_mel).mel
    m2 = model.apply(params, phonemes, style, n_frames=64,
                     method=StyleTTSZS.text_to_mel).mel
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


def test_reconstruct_path(model_and_params):
    cfg, model, params = model_and_params
    B, Tt, Tf = 2, 16, 64
    rng = jax.random.PRNGKey(1)
    phonemes = jax.random.randint(rng, (B, Tt), 1, cfg.text_encoder.vocab_size)
    mel = jax.random.normal(rng, (B, Tf, cfg.audio.n_mels))
    durations = jnp.full((B, Tt), Tf // Tt, dtype=jnp.int32)
    out, codes, styled = model.apply(params, phonemes, mel, durations,
                                     method=StyleTTSZS.reconstruct)
    assert out.mel.shape == mel.shape
    assert codes.shape == (B, cfg.style.n_codes, len(cfg.style.fsq_levels))
    assert styled.shape == (B, cfg.style.n_codes, cfg.style.d_style)


def test_style_changes_output(model_and_params):
    cfg, model, params = model_and_params
    phonemes = jnp.ones((1, 16), dtype=jnp.int32)
    s0 = jnp.zeros((1, cfg.style.n_codes, cfg.style.d_style))
    s1 = jnp.ones((1, cfg.style.n_codes, cfg.style.d_style))
    m0 = model.apply(params, phonemes, s0, n_frames=64,
                     method=StyleTTSZS.text_to_mel).mel
    m1 = model.apply(params, phonemes, s1, n_frames=64,
                     method=StyleTTSZS.text_to_mel).mel
    assert np.abs(np.asarray(m0) - np.asarray(m1)).max() > 1e-4


def test_alignment_expand():
    x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 4, 3))
    dur = jnp.asarray([[2, 0, 3, 1]], dtype=jnp.int32)
    y = align.expand_by_duration(x, dur, 8)
    expect = np.array([x[0, 0], x[0, 0], x[0, 2], x[0, 2], x[0, 2], x[0, 3],
                       np.zeros(3), np.zeros(3)])
    np.testing.assert_allclose(np.asarray(y)[0], expect)


def test_stretch_style_codes_endpoints():
    codes = jnp.asarray(np.stack([np.zeros((4, 2)), np.ones((4, 2))])
                        .astype(np.float32))
    codes = codes.at[:, :, 0].set(jnp.arange(4, dtype=jnp.float32))
    out = align.stretch_style_codes(codes, jnp.array([8, 6]), 8)
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out)[0, 7, 0], 3.0, atol=1e-6)
    # second utterance: last valid frame (5) hits the last code
    np.testing.assert_allclose(np.asarray(out)[1, 5, 0], 3.0, atol=1e-6)


def test_quantize_style_idempotent_on_extracted(model_and_params):
    """r5 regression (docs/artifacts/quantizer_roundtrip_r5.json):
    extract_style emits up(codes); re-quantizing it must be EXACT (the old
    down-path re-quantization recovered 0% of codes and scrambled speaker
    identity through four rounds of synth-margin failures)."""
    cfg, model, params = model_and_params
    mel = jax.random.normal(jax.random.PRNGKey(3), (2, 64, cfg.audio.n_mels))
    mask = jnp.ones((2, 64), bool)
    styled, codes, idx = model.apply(params, mel, mask,
                                     method=StyleTTSZS.extract_style)
    requant = model.apply(params, styled, method=StyleTTSZS.quantize_style)
    np.testing.assert_allclose(np.asarray(requant), np.asarray(styled),
                               atol=1e-4)


def test_quantize_style_projects_to_lattice(model_and_params):
    """A continuous (sampled) style must land ON the lattice image:
    quantize_style is idempotent, and the recovered codes round-trip
    through the flat index map."""
    cfg, model, params = model_and_params
    s = jax.random.normal(jax.random.PRNGKey(4),
                          (2, cfg.style.n_codes, cfg.style.d_style))
    q1 = model.apply(params, s, method=StyleTTSZS.quantize_style)
    q2 = model.apply(params, q1, method=StyleTTSZS.quantize_style)
    np.testing.assert_allclose(np.asarray(q2), np.asarray(q1), atol=1e-4)
    # and the projection actually moved the arbitrary point (it quantized)
    assert float(jnp.mean((q1 - s) ** 2)) > 1e-4
