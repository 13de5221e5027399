"""Pallas kernel unit tests vs XLA twins (interpret mode on CPU, SURVEY.md §4.2)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from styletts_zs_tpu.kernels import (attention_kernel, decoder_kernels,
                                     vocoder_kernels)
from styletts_zs_tpu.kernels import dispatch
from styletts_zs_tpu.ops import attention as attn_ops
from styletts_zs_tpu.ops import conv as conv_ops
from styletts_zs_tpu.ops import stft as stft_ops
from styletts_zs_tpu.utils.config import AudioConfig


def _rand(shape, seed=0, scale=1.0):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape).astype(np.float32)
        * scale)


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------

def test_local_attention_pallas_matches_twin():
    B, T, H, D = 2, 256, 4, 32
    chunk = 64
    q, k, v = (_rand((B, T, H, D), s) for s in range(3))
    ref = attn_ops.local_attention(q, k, v, chunk=chunk)
    out = attention_kernel.local_attention_pallas(q, k, v, chunk=chunk)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_local_attention_pallas_masked():
    B, T, H, D = 2, 192, 2, 16
    chunk = 64
    q, k, v = (_rand((B, T, H, D), s) for s in range(3))
    kv_mask = attn_ops.length_mask(jnp.array([150, 192]), T)
    ref = attn_ops.local_attention(q, k, v, chunk=chunk, kv_mask=kv_mask)
    out = attention_kernel.local_attention_pallas(q, k, v, chunk=chunk,
                                                  kv_mask=kv_mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_full_attention_pallas_matches_twin():
    B, Tq, Tk, H, D = 2, 128, 48, 4, 32
    q = _rand((B, Tq, H, D), 0)
    k = _rand((B, Tk, H, D), 1)
    v = _rand((B, Tk, H, D), 2)
    kv_mask = attn_ops.length_mask(jnp.array([40, 48]), Tk)
    ref = attn_ops.cross_attention(q, k, v, kv_mask=kv_mask)
    out = attention_kernel.full_attention_pallas(q, k, v, kv_mask=kv_mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


# ---------------------------------------------------------------------------
# fused AdaIN conv block
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dilation", [1, 3])
@pytest.mark.parametrize("tv_style", [False, True])
def test_adain_conv_block_pallas_matches_twin(dilation, tv_style):
    B, T, C, K = 2, 96, 16, 5
    x = _rand((B, T, C), 0)
    if tv_style:
        scale = _rand((B, T, 2 * C), 1, 0.2)
        shift = _rand((B, T, 2 * C), 2, 0.2)
    else:
        scale = _rand((B, 2 * C), 1, 0.2)
        shift = _rand((B, 2 * C), 2, 0.2)
    k1 = _rand((K, C, C), 3, 0.1)
    k2 = _rand((K, C, C), 4, 0.1)
    ref = dispatch.adain_conv_block(x, scale, shift, k1, k2,
                                    dilation=dilation, use_pallas=False)
    out = decoder_kernels.adain_conv_block_pallas(x, scale, shift, k1, k2,
                                                  dilation=dilation)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


def test_adain_conv_block_blocking_boundaries():
    """T spanning multiple kernel blocks with remainder."""
    B, T, C, K = 1, 300, 8, 3
    x = _rand((B, T, C), 0)
    scale = _rand((B, T, 2 * C), 1, 0.2)
    shift = _rand((B, T, 2 * C), 2, 0.2)
    k1 = _rand((K, C, C), 3, 0.1)
    k2 = _rand((K, C, C), 4, 0.1)
    ref = dispatch.adain_conv_block(x, scale, shift, k1, k2, dilation=9,
                                    use_pallas=False)
    out = decoder_kernels.adain_conv_block_pallas(x, scale, shift, k1, k2,
                                                  dilation=9)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=3e-5, rtol=3e-5)


# ---------------------------------------------------------------------------
# vocoder kernels
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("stride,K", [(5, 10), (3, 6), (5, 11), (2, 4)])
def test_conv_transpose_pallas_matches_twin(stride, K):
    B, T, Cin, Cout = 2, 40, 8, 16
    x = _rand((B, T, Cin), 0)
    kernel = _rand((K, Cin, Cout), 1, 0.2)
    ref = conv_ops.conv_transpose1d(x, kernel, stride=stride)
    out = vocoder_kernels.conv_transpose1d_pallas(x, kernel, stride=stride)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("n_fft,hop", [(16, 4), (48, 12)])
def test_istft_pallas_matches_twin(n_fft, hop):
    B, F = 2, 100
    n_freq = n_fft // 2 + 1
    real = _rand((B, F, n_freq), 0)
    imag = _rand((B, F, n_freq), 1)
    cfg = AudioConfig(n_fft=n_fft, win_length=n_fft, hop_length=hop)
    ref = stft_ops.istft(real, imag, cfg, center=True)
    out = vocoder_kernels.istft_pallas(real, imag, n_fft=n_fft, hop=hop)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_dispatch_switch_equivalence():
    """One switch, two backends (SURVEY.md §2.3)."""
    B, T, H, D = 1, 128, 2, 16
    q, k, v = (_rand((B, T, H, D), s) for s in range(3))
    a = dispatch.local_attention(q, k, v, chunk=32, use_pallas=False)
    b = dispatch.local_attention(q, k, v, chunk=32, use_pallas=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=2e-5, rtol=2e-5)


def test_sampler_pallas_path_matches_xla():
    """Full multi-step sampler: Pallas kernels vs XLA twins end-to-end."""
    import jax
    from styletts_zs_tpu.models.diffusion import StyleDiffusion
    from styletts_zs_tpu.utils.config import tiny_test_config

    cfg = tiny_test_config().model
    rng = jax.random.PRNGKey(0)
    B, Tt = 2, 16
    target = jax.random.normal(rng, (B, cfg.style.n_codes, cfg.style.d_style))
    text_enc = jax.random.normal(rng, (B, Tt, cfg.text_encoder.dim))
    tokens = jax.random.normal(rng, (B, 4, cfg.text_encoder.dim))
    summary = jax.random.normal(rng, (B, cfg.text_encoder.dim))

    m_xla = StyleDiffusion(cfg.diffusion, cfg.style,
                           ctx_dim=cfg.text_encoder.dim, use_pallas=False)
    m_pls = StyleDiffusion(cfg.diffusion, cfg.style,
                           ctx_dim=cfg.text_encoder.dim, use_pallas=True)
    params = m_xla.init(rng, target, text_enc, tokens, summary,
                        jax.random.PRNGKey(1),
                        method=StyleDiffusion.init_all)
    a = m_xla.apply(params, jax.random.PRNGKey(2), text_enc, tokens, summary,
                    n_steps=3, method=StyleDiffusion.sample)
    b = m_pls.apply(params, jax.random.PRNGKey(2), text_enc, tokens, summary,
                    n_steps=3, method=StyleDiffusion.sample)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=5e-4, rtol=1e-3)


def test_gradients_flow_through_pallas_dispatch():
    """Custom VJPs: grads through Pallas forwards match XLA-twin grads."""
    B, T, H, D = 1, 192, 2, 16
    q, k, v = (_rand((B, T, H, D), s) for s in range(3))

    def loss_p(q):
        return jnp.sum(dispatch.local_attention(q, k, v, chunk=64,
                                                use_pallas=True) ** 2)

    def loss_x(q):
        return jnp.sum(dispatch.local_attention(q, k, v, chunk=64,
                                                use_pallas=False) ** 2)

    gp = jax.grad(loss_p)(q)
    gx = jax.grad(loss_x)(q)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               atol=1e-4, rtol=1e-4)

    x = _rand((1, 96, 16), 0)
    sc = _rand((1, 96, 32), 1, 0.2)
    sh = _rand((1, 96, 32), 2, 0.2)
    k1 = _rand((5, 16, 16), 3, 0.1)
    k2 = _rand((5, 16, 16), 4, 0.1)
    gp = jax.grad(lambda x: jnp.sum(dispatch.adain_conv_block(
        x, sc, sh, k1, k2, dilation=3, use_pallas=True) ** 2))(x)
    gx = jax.grad(lambda x: jnp.sum(dispatch.adain_conv_block(
        x, sc, sh, k1, k2, dilation=3, use_pallas=False) ** 2))(x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               atol=1e-4, rtol=1e-4)

    xx = _rand((1, 40, 8), 0)
    kk = _rand((10, 8, 16), 1, 0.2)
    # conv_transpose1d YIELDS to the XLA twin under use_pallas=True (measured
    # win-or-yield, dispatch docstring) — exercise the retained Pallas
    # custom-VJP path directly so its gradient stays gated
    gp = jax.grad(lambda k_: jnp.sum(
        dispatch._conv_transpose_ad(5)(xx, k_) ** 2))(kk)
    gx = jax.grad(lambda k_: jnp.sum(dispatch.conv_transpose1d(
        xx, k_, stride=5, use_pallas=False) ** 2))(kk)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                               atol=1e-4, rtol=1e-4)


def test_local_attention_pallas_backward_kernels():
    """Dedicated flash-style bwd kernels match XLA-twin gradients."""
    B, T, H, D = 2, 384, 2, 32
    chunk = 128  # lane-aligned -> Pallas bwd path
    q, k, v = (_rand((B, T, H, D), s) for s in range(3))
    kv_mask = attn_ops.length_mask(jnp.array([300, 384]), T)

    def loss_p(q, k, v):
        return jnp.sum(dispatch.local_attention(
            q, k, v, chunk=chunk, kv_mask=kv_mask, use_pallas=True) ** 2)

    def loss_x(q, k, v):
        return jnp.sum(dispatch.local_attention(
            q, k, v, chunk=chunk, kv_mask=kv_mask, use_pallas=False) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gp, gx, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4,
                                   err_msg=f"d{name} mismatch")


@pytest.mark.parametrize("dilation", [1, 3])
@pytest.mark.parametrize("tv_style", [False, True])
def test_adain_conv_block_backward_kernels(dilation, tv_style):
    """Dedicated saved-stats bwd kernels match XLA-twin grads on ALL inputs."""
    B, T, C, K = 2, 96, 16, 5
    x = _rand((B, T, C), 0)
    if tv_style:
        sc = _rand((B, T, 2 * C), 1, 0.2)
        sh = _rand((B, T, 2 * C), 2, 0.2)
    else:
        sc = _rand((B, 2 * C), 1, 0.2)
        sh = _rand((B, 2 * C), 2, 0.2)
    k1 = _rand((K, C, C), 3, 0.1)
    k2 = _rand((K, C, C), 4, 0.1)

    def loss(up):
        def f(x, sc, sh, k1, k2):
            y = dispatch.adain_conv_block(x, sc, sh, k1, k2,
                                          dilation=dilation, use_pallas=up)
            return jnp.sum(jnp.sin(y))  # non-symmetric cotangent
        return f

    gp = jax.grad(loss(True), argnums=(0, 1, 2, 3, 4))(x, sc, sh, k1, k2)
    gx = jax.grad(loss(False), argnums=(0, 1, 2, 3, 4))(x, sc, sh, k1, k2)
    for a, b, name in zip(gp, gx, ["x", "scale", "shift", "k1", "k2"]):
        assert a.shape == b.shape, name
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=2e-4,
                                   err_msg=f"d{name} mismatch")


def test_local_attention_fwd_lse_matches_plain():
    B, T, H, D = 1, 384, 2, 16
    chunk = 128
    q, k, v = (_rand((B, T, H, D), s) for s in range(3))
    from styletts_zs_tpu.kernels import attention_kernel as AK
    out_plain = AK.local_attention_pallas(q, k, v, chunk=chunk)
    out_lse, res = AK.local_attention_fwd_pallas(q, k, v, chunk=chunk)
    np.testing.assert_allclose(np.asarray(out_lse), np.asarray(out_plain),
                               atol=1e-5, rtol=1e-5)
    lse = res[4]
    assert np.isfinite(np.asarray(lse)).all()


@pytest.mark.parametrize("n_fft,hop,C,T", [(48, 12, 64, 130), (8, 4, 32, 96)])
def test_synthesis_head_fused_matches_twin(n_fft, hop, C, T):
    """Fused leaky+conv+epilogue+OLA kernel vs the unfused XLA composition."""
    n_freq = n_fft // 2 + 1
    x = _rand((2, T, C), 0, 0.7)
    w = _rand((7, C, 3 * n_freq), 1, 0.05)
    b = _rand((3 * n_freq,), 2, 0.1)
    assert vocoder_kernels.synthesis_head_supported(n_fft=n_fft, hop=hop, K=7)
    ref = dispatch._synthesis_head_xla(x, w, b, n_fft=n_fft, hop=hop)
    out = vocoder_kernels.synthesis_head_pallas(x, w, b, n_fft=n_fft, hop=hop)
    assert out.shape == ref.shape == (2, (T - 1) * hop)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_synthesis_head_grads_match_twin():
    n_fft, hop, C, T = 48, 12, 32, 60
    n_freq = n_fft // 2 + 1
    x = _rand((2, T, C), 0, 0.7)
    w = _rand((7, C, 3 * n_freq), 1, 0.05)
    b = _rand((3 * n_freq,), 2, 0.1)

    def loss(up):
        return lambda x, w, b: jnp.sum(jnp.sin(dispatch.synthesis_head(
            x, w, b, n_fft=n_fft, hop=hop, use_pallas=up)))

    gp = jax.grad(loss(True), argnums=(0, 1, 2))(x, w, b)
    gx = jax.grad(loss(False), argnums=(0, 1, 2))(x, w, b)
    for a, b_, name in zip(gp, gx, ["x", "w", "b"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=2e-4,
                                   err_msg=f"d{name} mismatch")


def test_synthesis_head_unsupported_geometry_falls_back():
    # window spanning > P+1 super-frames must route to the XLA twin
    assert not vocoder_kernels.synthesis_head_supported(n_fft=512, hop=4, K=7)
    x, w, b = _rand((1, 40, 8), 0), _rand((7, 8, 3 * 257), 1, 0.01), \
        _rand((3 * 257,), 2, 0.01)
    out = dispatch.synthesis_head(x, w, b, n_fft=512, hop=4, use_pallas=True)
    ref = dispatch._synthesis_head_xla(x, w, b, n_fft=512, hop=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))


def test_synthesis_head_wide_nfreq_falls_back():
    """n_freq > 64 can't fit one 128-lane spec row: gate must say no and
    dispatch must route to the twin instead of crashing (review finding)."""
    assert not vocoder_kernels.synthesis_head_supported(n_fft=128, hop=64,
                                                        K=7)
    n_freq = 128 // 2 + 1
    x = _rand((1, 16, 8), 0)
    w = _rand((7, 8, 3 * n_freq), 1, 0.01)
    b = _rand((3 * n_freq,), 2, 0.01)
    out = dispatch.synthesis_head(x, w, b, n_fft=128, hop=64,
                                  use_pallas=True)
    ref = dispatch._synthesis_head_xla(x, w, b, n_fft=128, hop=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref))
