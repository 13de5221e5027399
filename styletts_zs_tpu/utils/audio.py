"""Host-side audio DSP: F0 estimation and framing for data prep.

No pretrained F0 network is downloadable offline (SURVEY.md §7.0); training
targets come from classic DSP — autocorrelation-based F0 with parabolic
interpolation (YIN-flavored difference normalization) — run on the host as a
data-prep step.  A native C++ implementation (styletts_zs_tpu/native) is used
when built; this numpy version is the reference and fallback.
"""
from __future__ import annotations

import numpy as np


def frame_audio(wav: np.ndarray, frame_length: int, hop: int) -> np.ndarray:
    """(T,) -> (n_frames, frame_length) with zero-padded tail."""
    n_frames = max(1, 1 + (len(wav) - frame_length + hop - 1) // hop)
    out = np.zeros((n_frames, frame_length), wav.dtype)
    for i in range(n_frames):
        seg = wav[i * hop: i * hop + frame_length]
        out[i, : len(seg)] = seg
    return out


def estimate_f0(wav: np.ndarray, sample_rate: int, *, hop: int = 300,
                frame_length: int = 1200, fmin: float = 60.0,
                fmax: float = 400.0, threshold: float = 0.1):
    """Frame-level F0 (Hz) + voicing via normalized difference (YIN-style).

    Returns (f0 (n_frames,), voiced (n_frames,) bool).
    """
    use_native = _native() is not None
    if use_native:
        return _native_f0(wav, sample_rate, hop, frame_length, fmin, fmax,
                          threshold)
    frames = frame_audio(wav.astype(np.float64), frame_length, hop)
    tau_min = max(2, int(sample_rate / fmax))
    tau_max = min(frame_length - 2, int(sample_rate / fmin))
    n = frames.shape[0]
    f0 = np.zeros(n)
    voiced = np.zeros(n, bool)
    for i in range(n):
        x = frames[i]
        if np.abs(x).max() < 1e-4:
            continue
        # difference function via autocorrelation: d(t) = r(0)+r_t(0)-2corr(t)
        spec = np.fft.rfft(x, 2 * frame_length)
        corr = np.fft.irfft(spec * np.conj(spec))[:tau_max + 1]
        cumsum = np.cumsum(x * x)
        r0 = cumsum[-1]
        rt = r0 - np.concatenate([[0.0], cumsum[:-1]])
        d = r0 + rt[: tau_max + 1] - 2 * corr
        # cumulative-mean normalization
        dn = np.ones_like(d)
        run = np.cumsum(d[1:])
        dn[1:] = d[1:] * np.arange(1, tau_max + 1) / np.maximum(run, 1e-12)
        seg = dn[tau_min: tau_max]
        if seg.size == 0:
            continue
        # first dip under threshold (then walk to its local minimum, per
        # YIN), else global min
        under = np.nonzero(seg < threshold)[0]
        if under.size:
            tau = under[0] + tau_min
            while tau + 1 < tau_max and dn[tau + 1] < dn[tau]:
                tau += 1
        else:
            tau = int(np.argmin(seg)) + tau_min
        if dn[tau] < 0.5:  # voicing decision
            # parabolic interpolation around tau
            if 1 <= tau < tau_max - 1:
                a, b, c = dn[tau - 1], dn[tau], dn[tau + 1]
                denom = a - 2 * b + c
                shift = 0.5 * (a - c) / denom if abs(denom) > 1e-12 else 0.0
                tau = tau + np.clip(shift, -1.0, 1.0)
            f0[i] = sample_rate / tau
            voiced[i] = True
    return f0.astype(np.float32), voiced


def normalized_log_f0(f0: np.ndarray, voiced: np.ndarray,
                      *, center: float = 5.0) -> np.ndarray:
    """log-F0 shifted by ``center`` (≈148 Hz); 0 where unvoiced.

    Matches the synthetic data pipeline's convention (pipelines/data.py).
    """
    out = np.zeros_like(f0, np.float32)
    v = voiced & (f0 > 1.0)
    out[v] = np.log(f0[v]) - center
    return out


def frame_energy(wav: np.ndarray, *, hop: int = 300,
                 frame_length: int = 1200) -> np.ndarray:
    """Log-RMS energy per frame."""
    frames = frame_audio(wav.astype(np.float64), frame_length, hop)
    rms = np.sqrt(np.mean(frames * frames, axis=1))
    return np.log(np.maximum(rms, 1e-5)).astype(np.float32)


# ---------------------------------------------------------------------------
# native bridge
# ---------------------------------------------------------------------------

_NATIVE = None
_NATIVE_CHECKED = False


def _native():
    global _NATIVE, _NATIVE_CHECKED
    if not _NATIVE_CHECKED:
        _NATIVE_CHECKED = True
        try:
            from styletts_zs_tpu.native import frontend as native_frontend
            _NATIVE = native_frontend if native_frontend.available() else None
        except Exception as e:
            import sys
            print(f"styletts_zs_tpu.utils.audio: native frontend import "
                  f"failed ({e!r}); numpy fallbacks in use", file=sys.stderr)
            _NATIVE = None
    return _NATIVE


def _native_f0(wav, sample_rate, hop, frame_length, fmin, fmax, threshold):
    return _native().estimate_f0(wav, sample_rate, hop=hop,
                                 frame_length=frame_length, fmin=fmin,
                                 fmax=fmax, threshold=threshold)


def resample_poly_np(wav: np.ndarray, sr_in: int, sr_out: int, *,
                     half: int = 10, beta: float = 8.6) -> np.ndarray:
    """Kaiser-windowed-sinc polyphase rational resampler (numpy reference).

    Math twin of the native ``stz_resample_poly`` (styletts_zs_tpu/native/
    frontend.cc) — tests gate the two against each other.  ``half`` zero
    crossings per branch; Kaiser ``beta`` 8.6 gives ~80 dB stopband.
    """
    import math
    g = math.gcd(int(sr_in), int(sr_out))
    L, M = sr_out // g, sr_in // g
    x = np.asarray(wav, np.float64)
    n = len(x)
    if L == M:
        return np.asarray(wav, np.float32)
    lm = max(L, M)
    N = 2 * half * lm + 1
    center = N // 2
    fc = 0.5 / lm                      # cycles/sample on the upsampled grid
    t = np.arange(N, dtype=np.float64) - center
    s = np.where(t == 0.0, 2.0 * fc,
                 np.sin(2.0 * np.pi * fc * t) / (np.pi * np.where(t == 0, 1,
                                                                  t)))
    r = t / center
    w = np.i0(beta * np.sqrt(np.maximum(0.0, 1.0 - r * r))) / np.i0(beta)
    h = L * s * w                      # (N,) float64
    # polyphase branches: Hp[p, q] = h[q*L + p]
    Q = (N - 1) // L + 1
    Hp = np.zeros((L, Q), np.float64)
    idx = np.arange(Q) * L
    for p in range(L):
        valid = idx + p < N
        Hp[p, valid] = h[idx[valid] + p]
    out_n = (n * L + M - 1) // M
    y = np.empty(out_n, np.float32)
    qs = np.arange(Q, dtype=np.int64)[None, :]
    # chunked so the (chunk, Q) gather temporaries stay ~a few MB instead
    # of O(out_n x Q) float64 (hundreds of MB for a 20 s 48 kHz wav)
    chunk = 65536
    for off in range(0, out_n, chunk):
        u = np.arange(off, min(off + chunk, out_n), dtype=np.int64) * M \
            + center
        p = (u % L).astype(np.int64)
        b = u // L
        k = b[:, None] - qs                                  # (chunk, Q)
        ok = (k >= 0) & (k < n)
        xg = np.where(ok, x[np.clip(k, 0, n - 1)], 0.0)
        y[off: off + len(u)] = np.einsum("oq,oq->o", Hp[p], xg)
    return y
