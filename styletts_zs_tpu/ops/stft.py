"""Mel/STFT frontend: waveform <-> spectrogram transforms.

TPU-first design: the STFT is a single strided convolution against a
precomputed windowed-DFT basis, so the whole transform is one MXU matmul —
no FFT primitive, identical math on CPU (golden, ``BASELINE.json:7``) and TPU,
exactly differentiable.  The iSTFT is the transposed convolution of the same
basis plus window-envelope normalization (overlap-add).

The reference repo has no code (``/root/reference/README.md`` is the entire
repo); conventions here are ours: reflect-pad center framing, window placed at
the start of the (zero-padded) n_fft frame, Slaney-style mel filterbank.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from styletts_zs_tpu.utils.config import AudioConfig


# ---------------------------------------------------------------------------
# numpy-side constant builders (host, once per config)
# ---------------------------------------------------------------------------

def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann window (matches torch.hann_window(periodic=True))."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float64)


def dft_basis(n_fft: int, win_length: int) -> tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT basis restricted to the window support.

    Follows the torch.stft convention: a win_length window is centered inside
    the n_fft frame (offset pad_w = (n_fft - win)//2), so the DFT phase of
    window sample n is k*(n + pad_w).  Returns (cos_basis, sin_basis), each
    (n_freq, win_length), such that for the win_length signal slice x under
    the window:  real_k = cos_basis[k] @ x ,  imag_k = -sin_basis[k] @ x.
    """
    n_freq = n_fft // 2 + 1
    pad_w = (n_fft - win_length) // 2
    n = np.arange(win_length)[None, :] + pad_w
    k = np.arange(n_freq)[:, None]
    ang = 2.0 * np.pi * k * n / n_fft
    win = hann_window(win_length)[None, :]
    return (np.cos(ang) * win), (np.sin(ang) * win)


def _hz_to_mel(f):
    """Slaney mel scale (linear below 1 kHz, log above)."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    logstep = np.log(6.4) / 27.0
    mel = f / f_sp
    log_region = f >= min_log_hz
    mel = np.where(log_region, min_log_hz / f_sp + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)
    return mel


def _mel_to_hz(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    f = m * f_sp
    log_region = m >= min_log_mel
    f = np.where(log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), f)
    return f


def mel_filterbank(sample_rate: int, n_fft: int, n_mels: int,
                   fmin: float, fmax: float) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape (n_mels, n_freq)."""
    n_freq = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_freq)
    mel_pts = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)
    fb = np.zeros((n_mels, n_freq), dtype=np.float64)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        fb[i] = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney norm: each filter integrates to ~2/bandwidth
    enorm = 2.0 / (hz_pts[2:n_mels + 2] - hz_pts[:n_mels])
    fb *= enorm[:, None]
    return fb


@functools.lru_cache(maxsize=8)
def stft_constants(cfg: AudioConfig):
    """Cached per-config constants as float32 numpy arrays."""
    cos_b, sin_b = dft_basis(cfg.n_fft, cfg.win_length)
    fb = mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax)
    return (cos_b.astype(np.float32), sin_b.astype(np.float32),
            fb.astype(np.float32))


# ---------------------------------------------------------------------------
# JAX transforms
# ---------------------------------------------------------------------------

def stft(wav: jax.Array, cfg: AudioConfig, *, center: bool = True) -> tuple[jax.Array, jax.Array]:
    """Real STFT via one strided conv. wav: (B, T) -> (real, imag): (B, F, n_freq).

    F = T // hop + 1 when center=True (reflect padding of win//2 each side).
    """
    cos_b, sin_b = stft_constants(cfg)[:2]
    pad_w = (cfg.n_fft - cfg.win_length) // 2
    hop, win = cfg.hop_length, cfg.win_length
    x = wav.astype(jnp.float32)
    if center:
        pad = cfg.n_fft // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
        # window sits pad_w into each n_fft frame; fold that into the start
        x = x[:, pad_w:]
    else:
        # uncentered: frame t covers [t*hop, t*hop + n_fft); skip to window
        x = x[:, pad_w:]
    # MXU formulation: a (B, T, 1)-input conv has contraction depth 1 and
    # runs essentially scalar on TPU (a train-step trace measured the MRD
    # spectrograms at ~880 ms/step this way).  Reshape the signal into
    # hop-width PANELS and convolve over the panel axis instead: frame t'
    # covers panels t'..t'+M-1, so the conv is (B, T/hop, hop) *
    # (M, hop, 2F) — contraction depth hop, one MXU-shaped op, identical
    # math (the basis is zero-padded from win to M*hop rows).
    M = -(-win // hop)
    n_valid = (x.shape[1] - win) // hop + 1   # frames the old layout yields
    T_pad = (n_valid - 1 + M) * hop           # cover the last frame's panels
    x = x[:, :T_pad] if x.shape[1] >= T_pad else jnp.pad(
        x, ((0, 0), (0, T_pad - x.shape[1])))
    panels = x.reshape(x.shape[0], -1, hop)   # (B, T/hop, hop)
    basis = np.concatenate([cos_b, -sin_b], axis=0).T  # (win, 2F)
    if M * hop > win:
        basis = np.pad(basis, ((0, M * hop - win), (0, 0)))
    kernel = jnp.asarray(basis.reshape(M, hop, -1))    # (M, hop, 2F)
    out = jax.lax.conv_general_dilated(
        panels, kernel,
        window_strides=(1,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32,
    )  # (B, n_valid, 2*n_freq)
    if center:
        n_frames = wav.shape[1] // cfg.hop_length + 1
        out = out[:, :n_frames]
    n_freq = cfg.n_fft // 2 + 1
    return out[..., :n_freq], out[..., n_freq:]


def spectrogram(wav: jax.Array, cfg: AudioConfig, *, power: float = 1.0,
                eps: float = 1e-9) -> jax.Array:
    """Magnitude (power=1) or power (power=2) spectrogram, (B, F, n_freq)."""
    re, im = stft(wav, cfg)
    mag_sq = re * re + im * im
    if power == 2.0:
        return mag_sq
    return jnp.sqrt(mag_sq + eps)


def mel_spectrogram(wav: jax.Array, cfg: AudioConfig) -> jax.Array:
    """Log-mel spectrogram, (B, F, n_mels). The canonical acoustic feature."""
    mag = spectrogram(wav, cfg, power=1.0)
    fb = jnp.asarray(stft_constants(cfg)[2])  # (n_mels, n_freq)
    mel = jnp.einsum("bfn,mn->bfm", mag, fb, preferred_element_type=jnp.float32)
    return jnp.log(jnp.maximum(mel, cfg.log_floor))


def istft(real: jax.Array, imag: jax.Array, cfg: AudioConfig, *,
          center: bool = True, eps: float = 1e-8) -> jax.Array:
    """Inverse STFT via transposed conv + window-envelope normalization.

    real/imag: (B, F, n_freq) -> wav (B, (F-1)*hop) when center=True.
    This is the XLA twin of the Pallas overlap-add kernel
    (styletts_zs_tpu/kernels/vocoder_kernels.py ``istft_pallas``); both must
    agree (SURVEY.md §2.3).
    """
    n_fft, win, hop = cfg.n_fft, cfg.win_length, cfg.hop_length
    n_freq = n_fft // 2 + 1
    # irfft synthesis weights restricted to the window support:
    #   x_n = (1/n_fft) * sum_k w_k * (real_k cos - imag_k sin), w = 2 except DC/nyq
    weights = np.full((n_freq,), 2.0, dtype=np.float32)
    weights[0] = 1.0
    if n_fft % 2 == 0:
        weights[-1] = 1.0
    # synthesis frames: frame_n = window_n * irfft(spec)_n   (win-length support,
    # window centered in the n_fft frame — same convention as ``dft_basis``).
    pad_w = (n_fft - win) // 2
    win_np = hann_window(win).astype(np.float32)
    n = np.arange(win)[None, :] + pad_w
    k = np.arange(n_freq)[:, None]
    ang = 2.0 * np.pi * k * n / n_fft
    raw_cos = np.cos(ang).astype(np.float32)
    raw_sin = np.sin(ang).astype(np.float32)
    syn_c = (weights[:, None] * raw_cos * win_np[None, :]) / n_fft  # (n_freq, win)
    syn_s = (weights[:, None] * raw_sin * win_np[None, :]) / n_fft

    frames = (
        jnp.einsum("bfn,nw->bfw", real.astype(jnp.float32), jnp.asarray(syn_c),
                   preferred_element_type=jnp.float32)
        - jnp.einsum("bfn,nw->bfw", imag.astype(jnp.float32), jnp.asarray(syn_s),
                     preferred_element_type=jnp.float32)
    )  # (B, F, win)

    B, F, _ = frames.shape
    total = (F - 1) * hop + win
    # overlap-add via transposed conv: treat frames as (B, F, win) with stride hop
    wav = jax.lax.conv_transpose(
        frames, _ola_kernel(win),
        strides=(hop,), padding="VALID", dimension_numbers=("NHC", "HIO", "NHC"),
    )[:, :, 0]  # (B, total)
    # window-envelope normalization: sum of squared windows at each sample
    env_frames = jnp.broadcast_to(
        jnp.asarray(win_np * win_np)[None, None, :], (1, F, win))
    env = jax.lax.conv_transpose(
        env_frames, _ola_kernel(win), strides=(hop,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"))[:, :, 0]
    wav = wav / jnp.maximum(env, eps)
    if center:
        # OLA index t*hop + n maps to original sample t*hop + pad_w + n - n_fft//2
        start = n_fft // 2 - pad_w
        wav = jax.lax.dynamic_slice_in_dim(wav, start, (F - 1) * hop, axis=1)
    return wav


@functools.lru_cache(maxsize=8)
def _ola_kernel_np(win: int) -> np.ndarray:
    # kernel (H=win, I=win, O=1): output sample t*hop+c accumulates input
    # channel c — jax.lax.conv_transpose applies the kernel spatially
    # flipped, so channel c maps to tap win-1-c.
    k = np.zeros((win, win, 1), dtype=np.float32)
    for h in range(win):
        k[h, win - 1 - h, 0] = 1.0
    return k


def _ola_kernel(win: int) -> jax.Array:
    return jnp.asarray(_ola_kernel_np(win))


def frame_signal(wav: jax.Array, frame_length: int, hop: int) -> jax.Array:
    """(B, T) -> (B, n_frames, frame_length) framing via strided gather."""
    B, T = wav.shape
    n_frames = 1 + (T - frame_length) // hop
    idx = (jnp.arange(n_frames)[:, None] * hop + jnp.arange(frame_length)[None, :])
    return wav[:, idx]
