"""Host DSP: numpy F0/energy reference vs native C++ frontend."""
import numpy as np
import pytest

from styletts_zs_tpu.utils import audio as A


def _tone(f0=150.0, sr=24000, secs=0.5):
    t = np.arange(int(sr * secs)) / sr
    return (0.5 * np.sin(2 * np.pi * f0 * t)
            + 0.2 * np.sin(4 * np.pi * f0 * t)).astype(np.float32)


def test_f0_estimates_tone_numpy():
    wav = _tone(150.0)
    # force the numpy path
    A._NATIVE, A._NATIVE_CHECKED = None, True
    f0, voiced = A.estimate_f0(wav, 24000)
    A._NATIVE_CHECKED = False
    mid = slice(2, len(f0) - 2)
    assert voiced[mid].mean() > 0.9
    est = np.median(f0[mid][voiced[mid]])
    assert abs(est - 150.0) < 3.0


def test_silence_unvoiced():
    wav = np.zeros(12000, np.float32)
    A._NATIVE, A._NATIVE_CHECKED = None, True
    f0, voiced = A.estimate_f0(wav, 24000)
    A._NATIVE_CHECKED = False
    assert not voiced.any()


def test_native_matches_numpy():
    from styletts_zs_tpu.native import frontend as nf
    if not nf.available():
        pytest.skip("native frontend not built")
    rng = np.random.default_rng(0)
    wav = _tone(220.0) + 0.01 * rng.standard_normal(12000).astype(np.float32)
    A._NATIVE, A._NATIVE_CHECKED = None, True
    f0_np, v_np = A.estimate_f0(wav, 24000)
    A._NATIVE_CHECKED = False
    f0_cc, v_cc = nf.estimate_f0(wav, 24000)
    assert (v_np == v_cc).mean() > 0.97
    both = v_np & v_cc
    np.testing.assert_allclose(f0_cc[both], f0_np[both], rtol=5e-3)

    e_np = A.frame_energy(wav)
    e_cc = nf.frame_energy(wav)
    np.testing.assert_allclose(e_cc, e_np, atol=1e-4)


def test_normalized_log_f0():
    f0 = np.array([150.0, 0.0, 200.0], np.float32)
    v = np.array([True, False, True])
    out = A.normalized_log_f0(f0, v)
    assert out[1] == 0.0
    np.testing.assert_allclose(out[0], np.log(150.0) - 5.0, rtol=1e-5)
