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


def test_resample_native_matches_numpy_twin():
    from styletts_zs_tpu.native import frontend
    from styletts_zs_tpu.utils import audio as A
    if not frontend.available():
        import pytest
        pytest.skip("native lib not built")
    rng = np.random.default_rng(0)
    for sr_in, sr_out in [(22050, 24000), (16000, 24000), (48000, 24000),
                          (24000, 24000), (44100, 24000)]:
        wav = rng.standard_normal(int(sr_in * 0.37)).astype(np.float32)
        a = frontend.resample_poly(wav, sr_in, sr_out)
        b = A.resample_poly_np(wav, sr_in, sr_out)
        assert a.shape == b.shape, (sr_in, sr_out)
        np.testing.assert_allclose(a, b, atol=2e-6,
                                   err_msg=f"{sr_in}->{sr_out}")


def test_resample_tone_preserved_and_alias_rejected():
    from styletts_zs_tpu.pipelines.corpus import resample
    sr_in, sr_out = 48000, 24000
    t = np.arange(int(sr_in * 0.5)) / sr_in
    # 1 kHz passband tone: preserved; 15 kHz tone (> out Nyquist): rejected
    tone = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
    alias = np.sin(2 * np.pi * 15000.0 * t).astype(np.float32)
    out_tone = resample(tone, sr_in, sr_out)
    out_alias = resample(alias, sr_in, sr_out)
    mid = slice(len(out_tone) // 4, 3 * len(out_tone) // 4)
    rms = lambda x: float(np.sqrt(np.mean(np.square(x[mid], dtype=np.float64))))
    assert abs(rms(out_tone) - 1 / np.sqrt(2)) < 0.01     # ~0 dB passband
    assert rms(out_alias) < 0.003 * rms(out_tone)         # > 50 dB stopband


def test_resample_cross_check_scipy():
    """Independent cross-check: our polyphase resampler vs scipy's."""
    import scipy.signal
    from styletts_zs_tpu.utils import audio as A
    sr_in, sr_out = 22050, 24000
    # multi-tone signal within 80% of the input band: both filters are flat
    # there (they differ only in the transition band / window choice)
    t = np.arange(8000) / sr_in
    rng = np.random.default_rng(1)
    freqs = rng.uniform(50.0, 0.4 * sr_in * 0.8, size=12)
    wav = sum(np.sin(2 * np.pi * f * t + i) for i, f in enumerate(freqs))
    wav = (wav / np.sqrt(len(freqs) / 2)).astype(np.float32)  # unit RMS
    ours = A.resample_poly_np(wav, sr_in, sr_out)
    import math
    g = math.gcd(sr_in, sr_out)
    theirs = scipy.signal.resample_poly(wav.astype(np.float64),
                                        sr_out // g, sr_in // g)
    n = min(len(ours), len(theirs))
    mid = slice(n // 8, 7 * n // 8)
    err = np.sqrt(np.mean((ours[:n][mid] - theirs[:n][mid]) ** 2))
    assert err < 5e-3, err  # different window params; same band behavior
