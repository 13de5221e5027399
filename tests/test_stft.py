"""Mel/STFT frontend numerics, cross-checked against torch.stft (CPU, independent)."""
import jax.numpy as jnp
import numpy as np
import pytest

from styletts_zs_tpu.ops import stft as S
from styletts_zs_tpu.utils.config import AudioConfig

CFG = AudioConfig(n_fft=512, win_length=400, hop_length=100, n_mels=40,
                  fmax=8000.0)


def _rand_wav(b=2, t=2000, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((b, t)).astype(np.float32) * 0.3


def test_stft_matches_torch():
    torch = pytest.importorskip("torch")
    wav = _rand_wav()
    re, im = S.stft(jnp.asarray(wav), CFG)
    ref = torch.stft(
        torch.from_numpy(wav), n_fft=CFG.n_fft, hop_length=CFG.hop_length,
        win_length=CFG.win_length,
        window=torch.hann_window(CFG.win_length, periodic=True),
        center=True, pad_mode="reflect", return_complex=True,
    )  # (B, n_freq, F)
    ref_re = ref.real.numpy().transpose(0, 2, 1)
    ref_im = ref.imag.numpy().transpose(0, 2, 1)
    assert re.shape == ref_re.shape
    np.testing.assert_allclose(np.asarray(re), ref_re, atol=2e-3, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(im), ref_im, atol=2e-3, rtol=1e-4)


def test_istft_roundtrip():
    wav = _rand_wav(t=2000)
    re, im = S.stft(jnp.asarray(wav), CFG)
    rec = S.istft(re, im, CFG)
    # interior samples reconstruct (edges lose overlap coverage)
    w, r = wav[:, 400:-400], np.asarray(rec)[:, 400:-400]
    np.testing.assert_allclose(r, w[:, : r.shape[1]], atol=1e-3, rtol=1e-3)


def test_mel_shape_and_finiteness():
    wav = _rand_wav(t=2000)
    mel = S.mel_spectrogram(jnp.asarray(wav), CFG)
    assert mel.shape == (2, 21, CFG.n_mels)
    assert np.isfinite(np.asarray(mel)).all()


def test_mel_filterbank_rows_nonzero():
    fb = S.mel_filterbank(24000, 2048, 80, 0.0, 12000.0)
    assert fb.shape == (80, 1025)
    assert (fb.sum(axis=1) > 0).all()


def test_small_istft_config():
    """Vocoder-head-sized iSTFT (n_fft=16, hop=4) roundtrips."""
    cfg = AudioConfig(n_fft=16, win_length=16, hop_length=4, n_mels=8)
    wav = _rand_wav(t=256)
    re, im = S.stft(jnp.asarray(wav), cfg)
    rec = S.istft(re, im, cfg)
    w, r = wav[:, 16:-16], np.asarray(rec)[:, 16:-16]
    np.testing.assert_allclose(r, w[:, : r.shape[1]], atol=1e-4, rtol=1e-3)
