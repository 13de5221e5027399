"""Pallas TPU kernels for the vocoder: transposed conv + iSTFT overlap-add.

Obligation: "vocoder transposed-conv/iSTFT kernels ... hand-written Pallas"
(``BASELINE.json:5``; SURVEY.md §7.2 ranks overlap-add write conflicts as the
top hard part).  Both kernels sidestep scatter/write conflicts by being
**output-stationary**: every output sample is a gather-sum over the (static)
set of input taps that touch it, so each grid block writes disjoint output.

Key transform (derivation in comments): a stride-r transposed conv is, per
output phase φ = o mod r, a sum over m of x[t - m] @ W_m[φ] with static tap
matrices W_m.  Concatenating the M+1 shifted input views along features turns
the whole block into ONE MXU matmul  (T_b, (M+1)·Cin) @ ((M+1)·Cin, r·Cout).
The iSTFT folds its synthesis DFT matmul into the same structure (taps are
slices of the synthesis basis), then divides by the precomputed
window-envelope.

Numerics match the XLA twins (``ops.conv.conv_transpose1d``,
``ops.stft.istft``) allclose; tests gate this.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from styletts_zs_tpu.ops import stft as stft_ops


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# shared: shifted-view matmul kernel
# ---------------------------------------------------------------------------

def _shift_matmul_kernel(x_ref, halo_ref, w_ref, o_ref, *, block_t: int,
                         n_shift: int, left: int, r: int, c_out: int,
                         transposed: bool):
    """o[q*r + phi] = sum_m window[q + (n_shift-1-m) ...] — see wrapper.

    x_ref: (1, block_t, Cin); halo_ref: (1, 1, left+right, Cin) with
    left+right = n_shift-1+right halo frames; w_ref: ((n_shift)*Cin, r*c_out).
    The window is [left-halo | block | right-halo]; shift s takes
    window[s : s + block_t] for s = 0..n_shift-1.

    ``transposed`` (used when r*c_out is narrow, e.g. the iSTFT head's
    c_out=1): computes y^T = w^T @ window^T so the LANE axis is block_t
    (full 128-wide tiles) instead of the narrow phase axis.
    """
    main = x_ref[0, :, :]
    halo = halo_ref[0, 0, :, :]
    parts = []
    if left > 0:
        parts.append(halo[:left, :])
    parts.append(main)
    if halo.shape[0] - left > 0:
        parts.append(halo[left:, :])
    window = jnp.concatenate(parts, axis=0) if len(parts) > 1 else main
    c_in = main.shape[-1]
    if transposed:
        yt = jnp.zeros((o_ref.shape[-2], block_t), jnp.float32)  # (r*c_out, bt)
        for s in range(n_shift):
            # (r*c_out, Cin) @ (Cin, block_t): contract Cin, lanes = block_t
            yt += jax.lax.dot_general(
                w_ref[s * c_in: (s + 1) * c_in, :],
                window[s: s + block_t, :],
                (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[0, 0, :, :] = yt.astype(o_ref.dtype)
        return
    y = jnp.zeros((block_t, o_ref.shape[-1]), jnp.float32)
    for s in range(n_shift):
        # view s reads x[q + s - left]; its tap weights are rows [s*Cin, ...)
        y += jax.lax.dot_general(
            window[s: s + block_t, :], w_ref[s * c_in: (s + 1) * c_in, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # (block_t, r*c_out)
    o_ref[0, :, :] = y.astype(o_ref.dtype)


def _make_strips(xp, n_blocks, block_t, left, right):
    """xp: zero-padded (B, n_blocks*block_t + left + right, C) ->
    (B, n_blocks, left+right, C): the [left | right] halo frames of block i."""
    l_idx = (jnp.arange(n_blocks)[:, None] * block_t
             + jnp.arange(left)[None, :])
    r_idx = (jnp.arange(n_blocks)[:, None] * block_t
             + block_t + left + jnp.arange(right)[None, :])
    idx = jnp.concatenate([l_idx, r_idx], axis=1)
    return xp[:, idx, :]


@functools.partial(jax.jit,
                   static_argnames=("r", "n_shift", "left", "right",
                                    "block_t"))
def _shift_matmul(x, w_cat, *, r: int, n_shift: int, left: int, right: int,
                  block_t: int = 256):
    """x: (B, T, Cin), w_cat: (n_shift*Cin, r*Cout) -> (B, T*r, Cout).

    out[(q)*r + phi] = sum_s window_view_s[q] @ w_cat rows of view s, where
    view s corresponds to input shift x[q + s - left].
    """
    B, T, Cin = x.shape
    c_out = w_cat.shape[1] // r
    bt = min(block_t, T)
    n_blocks = -(-T // bt)
    T_pad = n_blocks * bt
    xp = jnp.pad(x, ((0, 0), (left, right + (T_pad - T)), (0, 0)))
    main = xp[:, left: left + T_pad, :]
    strips = _make_strips(xp, n_blocks, bt, left, right)

    # narrow outputs (iSTFT head: r*c_out ~ hop) use the transposed layout so
    # lanes carry block_t instead of the narrow phase axis
    transposed = r * c_out < 64
    kern = functools.partial(_shift_matmul_kernel, block_t=bt,
                             n_shift=n_shift, left=left, r=r, c_out=c_out,
                             transposed=transposed)
    in_specs = [
        pl.BlockSpec((1, bt, Cin), lambda b, i: (b, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, left + right, Cin),
                     lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n_shift * Cin, r * c_out), lambda b, i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if transposed:
        out = pl.pallas_call(
            kern,
            grid=(B, n_blocks),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, 1, r * c_out, bt),
                                   lambda b, i: (b, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, n_blocks, r * c_out, bt),
                                           x.dtype),
            interpret=_interpret(),
        )(main, strips, w_cat)
        # sample (i*bt + q)*r + phi lives at [b, i, phi_cout, q]
        # -> transpose to (B, n, bt, r*c_out) -> flat time-major
        out = jnp.transpose(out, (0, 1, 3, 2)).reshape(B, T_pad * r, c_out)
        return out[:, : T * r, :]
    out = pl.pallas_call(
        kern,
        grid=(B, n_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bt, r * c_out), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T_pad, r * c_out), x.dtype),
        interpret=_interpret(),
    )(main, strips, w_cat)
    # (B, T_pad, r*c_out) -> interleave phases -> (B, T_pad*r, c_out)
    out = out.reshape(B, T_pad * r, c_out)
    return out[:, : T * r, :]


# ---------------------------------------------------------------------------
# transposed conv
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=32)
def _convt_plan(K: int, r: int):
    """Static plan: taps m and padding for the stride-r transposed conv.

    Derivation: jax.lax.conv_transpose(VALID) computes
        full[f] = sum_t x[t] @ Kf[f - t*r],  Kf = kernel flipped on taps,
    and ops.conv.conv_transpose1d trims p = (K - r)//2 from the left, so
        out[q*r + phi] = sum_m x[q - m] @ Kf[phi + p + m*r]
    over every m with 0 <= phi + p + m*r < K.  m ranges over
    [-(p // r + 1) ... (K - 1 - p) // r] conservatively; invalid taps are
    zero rows in the padded basis.
    """
    p = (K - r) // 2
    # smallest m with phi + p + m*r >= 0 for some phi in [0, r):
    # phi = r-1 needs m >= -(p + r - 1)/r
    m_min = -((p + r - 1) // r)
    m_max = (K - 1 - p) // r
    return p, m_min, m_max


def _convt_wcat(kernel: jax.Array, r: int) -> tuple[jax.Array, int, int]:
    """Build the concatenated tap-weight matrix for ``_shift_matmul``.

    Returns (w_cat ((M)*Cin, r*Cout), n_shift, left) where shift-view s
    corresponds to tap m = m_max - s (so view s reads x[q - m] = window
    shifted by s with left halo = m_max).
    """
    K, Cin, Cout = kernel.shape
    p, m_min, m_max = _convt_plan(K, r)
    Kf = jnp.flip(kernel, axis=0)                      # (K, Cin, Cout)
    # pad tap axis so every slice [p + m*r, +r) is in range
    lo = p + m_min * r
    hi = p + m_max * r + r
    Kf_ext = jnp.pad(Kf, ((max(0, -lo), max(0, hi - K)), (0, 0), (0, 0)))
    off = max(0, -lo)
    blocks = []
    # view s=0 is the largest shift (reads oldest x): m = m_max down to m_min
    for m in range(m_max, m_min - 1, -1):
        Wm = jax.lax.dynamic_slice_in_dim(Kf_ext, off + p + m * r, r, axis=0)
        blocks.append(jnp.transpose(Wm, (1, 0, 2)))    # (Cin, r, Cout)
    w = jnp.stack(blocks, axis=0)                      # (M, Cin, r, Cout)
    M = m_max - m_min + 1
    w_cat = w.reshape(M * Cin, r * Cout)
    return w_cat, M, m_max


def conv_transpose1d_pallas(x, kernel, *, stride: int):
    """Pallas twin of ``ops.conv.conv_transpose1d`` (HiFi-GAN padding)."""
    K, Cin, Cout = kernel.shape
    r = stride
    _, m_min, m_max = _convt_plan(K, r)
    w_cat, M, left = _convt_wcat(kernel, r)
    right = -m_min
    return _shift_matmul(x, w_cat, r=r, n_shift=M, left=left, right=right)


# ---------------------------------------------------------------------------
# iSTFT head
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def _istft_basis_sf(n_fft: int, hop: int, P: int, n_freq_pad: int):
    """Super-frame iSTFT bases: P frames -> P*hop output samples per row.

    Derivation: with M = n_fft//hop frames overlapping each sample,
        out[(Pt + q)*hop + phi] = sum_{m=0..M-1} frame[Pt + q - m] . syn[:, phi + hop*m]
    Split by whether q - m falls in super-frame t (W0) or t-1 (W1):
        W0[f*C + c, q*hop + phi] = syn[c, phi + hop*(q - f)],  0 <= q-f < M
        W1[f*C + c, q*hop + phi] = syn[c, phi + hop*(q - f + P)], 0 <= q-f+P < M
    where C = 2*n_freq_pad ([re | im] stacked, zero rows for lane padding).
    Each output tile is then TWO dense (P*C, P*hop) matmuls — MXU-shaped
    (128-wide lanes) instead of the (hop, bt) slivers of a per-phase
    formulation, which measured ~1.8% of HBM peak.
    """
    n_freq = n_fft // 2 + 1
    win = n_fft
    weights = np.full((n_freq,), 2.0, dtype=np.float32)
    weights[0] = 1.0
    if n_fft % 2 == 0:
        weights[-1] = 1.0
    n = np.arange(win)[None, :]
    k = np.arange(n_freq)[:, None]
    ang = 2.0 * np.pi * k * n / n_fft
    win_np = stft_ops.hann_window(win).astype(np.float32)
    syn_c = (weights[:, None] * np.cos(ang) * win_np[None, :]) / n_fft
    syn_s = (weights[:, None] * np.sin(ang) * win_np[None, :]) / n_fft
    C = 2 * n_freq_pad
    syn = np.zeros((C, win), np.float32)
    syn[:n_freq] = syn_c
    syn[n_freq_pad: n_freq_pad + n_freq] = -syn_s
    M = (win - 1) // hop + 1
    W0 = np.zeros((P * C, P * hop), np.float32)
    W1 = np.zeros((P * C, P * hop), np.float32)
    for q in range(P):
        for m in range(M):
            j0 = m * hop
            j1 = min(j0 + hop, win)
            f = q - m
            if f >= 0:
                W0[f * C:(f + 1) * C, q * hop: q * hop + (j1 - j0)] = \
                    syn[:, j0:j1]
            else:
                W1[(f + P) * C:(f + P + 1) * C,
                   q * hop: q * hop + (j1 - j0)] = syn[:, j0:j1]
    return W0, W1, M


def _istft_sf_kernel(xs_ref, strip_ref, w0_ref, w1_ref, env_ref, o_ref, *,
                     precision):
    """o = (xs @ W0 + prev_row(xs) @ W1) * inv_env  per (bt, 128) tile."""
    xs = xs_ref[0]                                    # (bt, P*C)
    strip = strip_ref[0, 0]                           # (1, P*C): row before
    prev = jnp.concatenate([strip, xs[:-1, :]], axis=0)
    acc = jax.lax.dot_general(
        xs, w0_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    acc += jax.lax.dot_general(
        prev, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)
    o_ref[0] = (acc * env_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("n_fft", "hop", "P", "block_t",
                                    "precision"))
def _istft_sf_impl(spec, inv_env, *, n_fft: int, hop: int, P: int,
                   block_t: int = 64, precision=None):
    """spec: (B, F_sup, P*C) super-frames -> (B, F_sup, P*hop) samples."""
    B, F_sup, PC = spec.shape
    W0, W1, _ = _istft_basis_sf(n_fft, hop, P, (PC // P) // 2)
    bt = block_t
    assert F_sup % bt == 0, (F_sup, bt)  # caller pads (istft_pallas)
    n_blocks = F_sup // bt
    # strip i = super-frame row i*bt - 1 (zero row for i = 0)
    idx = jnp.maximum(jnp.arange(n_blocks) * bt - 1, 0)
    strips = spec[:, idx, :] * (jnp.arange(n_blocks) > 0)[None, :, None]
    strips = strips[:, :, None, :]                    # (B, n, 1, P*C)
    out = pl.pallas_call(
        functools.partial(_istft_sf_kernel, precision=precision),
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec((1, bt, PC), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, PC), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(W0.shape, lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(W1.shape, lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, P * hop), lambda b, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bt, P * hop), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, F_sup, P * hop), jnp.float32),
        interpret=_interpret(),
    )(spec, strips, jnp.asarray(W0), jnp.asarray(W1), inv_env)
    return out


@functools.lru_cache(maxsize=32)
def _istft_env(n_fft: int, hop: int, F: int, out_len: int):
    """Window-envelope normalizer over the padded OLA output length."""
    win = n_fft
    w2 = np.asarray(stft_ops.hann_window(win), np.float64) ** 2
    env = np.zeros((out_len,), np.float64)
    for t in range(F):
        end = min(t * hop + win, out_len)
        env[t * hop: end] += w2[: end - t * hop]
    env = np.maximum(env, 1e-8)
    return env.astype(np.float32)


# ---------------------------------------------------------------------------
# fused synthesis head: leaky_relu -> head conv -> mag/phase -> iSTFT OLA
# ---------------------------------------------------------------------------

def _synth_head_kernel(x_ref, strip_ref, w_ref, b_ref, w0_ref, w1_ref,
                       env_ref, o_ref, *, bt: int, P: int, C2: int,
                       n_freq: int, K: int, n_frames: int):
    """One (bt super-frames, P*hop samples) output tile, fully fused.

    Pipeline per tile (everything VMEM-resident — the HBM round trips of
    the unfused path: head-conv output (lane-padded 3*n_freq), fp32
    real/imag pair, concat/pad/reshape relayouts, all disappear):
      window = [P+kl left halo | main | kr right halo]   (frames, C)
      h      = leaky_relu(window)                         twin: vocoder.py
      y      = sum_s h[s:s+Np] @ W[s] + b                 head conv, K taps
      spec   = mag/phase epilogue (exp/clip/rsqrt), masked to valid frames
      xs     = spec.reshape(bt+1, P*C2)                   super-frame fold
      out    = (xs[1:] @ W0 + xs[:-1] @ W1) * inv_env     OLA + normalize
    The P extra frames at the left are recomputed so row 0 provides the
    previous super-frame for the W1 term (cross-block dependency becomes a
    1.5% recompute instead of an HBM pass).
    """
    i = pl.program_id(1)
    N = bt * P
    Np = N + P
    kl = (K - 1) // 2
    left = P + kl
    main = x_ref[...]                      # (N, C) — time-major view
    halo = strip_ref[0]                    # (left + kr, C)
    window = jnp.concatenate([halo[:left], main, halo[left:]], axis=0)
    # leaky_relu; compare in fp32 (Mosaic: no bf16 compare on v5e)
    h = jnp.where(window.astype(jnp.float32) >= 0, window,
                  window * jnp.asarray(0.1, window.dtype))
    C = main.shape[-1]
    acc = jnp.zeros((Np, w_ref.shape[-1]), jnp.float32)
    for s in range(K):
        acc += jax.lax.dot_general(
            h[s: s + Np, :], w_ref[s * C:(s + 1) * C, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    # match the twin's rounding: conv output + bias in the compute dtype
    y = (acc.astype(main.dtype) + b_ref[0].astype(main.dtype)
         ).astype(jnp.float32)
    logmag = y[:, :n_freq]
    pcv = y[:, n_freq: 2 * n_freq]
    psv = y[:, 2 * n_freq: 3 * n_freq]
    mag = jnp.exp(jnp.clip(logmag, -12.0, 6.0))
    norm = jax.lax.rsqrt(pcv * pcv + psv * psv + 1e-7)
    fidx = (i * N - P) + jax.lax.broadcasted_iota(jnp.int32, (Np, 1), 0)
    valid = ((fidx >= 0) & (fidx < n_frames)).astype(jnp.float32)
    real = mag * pcv * norm * valid
    imag = mag * psv * norm * valid
    z = jnp.zeros((Np, C2 // 2 - n_freq), jnp.float32)
    spec = jnp.concatenate([real, z, imag, z], axis=1)   # (Np, C2)
    specr = spec.reshape(bt + 1, P * C2)
    out = jax.lax.dot_general(
        specr[1:, :], w0_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out += jax.lax.dot_general(
        specr[:-1, :], w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = (out * env_ref[...]).astype(o_ref.dtype)


def synthesis_head_supported(*, n_fft: int, hop: int, K: int,
                             channels: int | None = None,
                             dtype=None) -> bool:
    """Geometry gate for the fused head kernel (else: XLA twin).

    Requires: the OLA window spans <= 2 super-frames (W0/W1 split), odd K
    (symmetric SAME conv halo), and n_freq <= C2/2 = 64 so real+imag fit
    one 128-lane spec row.  When given, ``channels`` must be lane-aligned
    (C % 128 == 0 — Mosaic rejects the narrower super-frame fold reshape at
    TPU compile time, after the XLA twin was already bypassed; ADVICE r2)
    and ``dtype`` one the kernel's matmuls accept.
    """
    import jax.numpy as _jnp
    P = max(1, 128 // hop)
    # Mosaic's lane-fold restriction only exists on the real TPU compile;
    # interpret mode (CPU tests) keeps exercising the kernel at narrow C
    if channels is not None and channels % 128 != 0 and not _interpret():
        return False
    if dtype is not None and _jnp.dtype(dtype) not in (
            _jnp.dtype(_jnp.bfloat16), _jnp.dtype(_jnp.float32)):
        return False
    return ((n_fft - 1) // hop + 1 <= P and K % 2 == 1
            and n_fft // 2 + 1 <= 64)


@functools.partial(jax.jit, static_argnames=("n_fft", "hop", "block_t"))
def synthesis_head_pallas(x, w, b, *, n_fft: int, hop: int,
                          block_t: int = 128):
    """Fused vocoder synthesis head (Pallas twin of the composition in
    ``kernels.dispatch._synthesis_head_xla``).

    x: (B, T, C) pre-activation MRF output; w: (K, C, 3*n_freq) head-conv
    kernel; b: (3*n_freq,). Returns wav (B, (T-1)*hop) float32.
    """
    B, T, C = x.shape
    K = w.shape[0]
    n_freq = n_fft // 2 + 1
    P = max(1, 128 // hop)
    assert synthesis_head_supported(n_fft=n_fft, hop=hop, K=K)
    # C2 = one full lane tile so the super-frame fold is the tile-aligned
    # reshape (Np, 128) -> (bt+1, P*128); narrower folds (e.g. (650, 64) ->
    # (65, 640)) are rejected by Mosaic's tpu.reshape
    C2 = 128
    start = n_fft // 2
    extra = -(-start // hop) + 1
    F_sup = -(-(T + extra) // P)
    bt = min(block_t, 1 << (F_sup - 1).bit_length())
    F_sup = -(-F_sup // bt) * bt
    T_pad = F_sup * P
    kl, kr = (K - 1) // 2, K // 2
    left = P + kl
    n_blocks = F_sup // bt
    N = bt * P
    # Consume x through its TIME-MAJOR view (T, B*C): TPU convs emit
    # (B, T, C) in layout {2,0,1} — physically (T, B, C) — while a Pallas
    # operand must be default-layout.  Feeding the (B, T, C) array directly
    # makes XLA's layout assignment push the default-layout demand backward
    # through the whole MRF stack (observed: +14 ms of 210 MB relayout
    # fusions per call); the explicit transpose below is a free bitcast at
    # the seam instead.
    xt = jnp.transpose(x, (1, 0, 2)).reshape(T, B * C)
    xp = jnp.pad(xt, ((left, kr + (T_pad - T)), (0, 0)))
    l_idx = (jnp.arange(n_blocks)[:, None] * N + jnp.arange(left)[None, :])
    r_idx = (jnp.arange(n_blocks)[:, None] * N + N + left
             + jnp.arange(kr)[None, :])
    strips = xp[jnp.concatenate([l_idx, r_idx], axis=1), :]
    main = xp[left: left + T_pad, :]
    w_cat = w.reshape(K * C, 3 * n_freq).astype(x.dtype)
    b2 = jnp.asarray(b, jnp.float32).reshape(1, 3 * n_freq)
    W0, W1, _ = _istft_basis_sf(n_fft, hop, P, C2 // 2)
    S_pad = T_pad * hop
    inv_env = (1.0 / _istft_env(n_fft, hop, T, S_pad)).astype(np.float32)
    inv_env = jnp.asarray(inv_env.reshape(F_sup, P * hop))
    kern = functools.partial(_synth_head_kernel, bt=bt, P=P, C2=C2,
                             n_freq=n_freq, K=K, n_frames=T)
    out = pl.pallas_call(
        kern,
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec((N, C), lambda bb, i: (i, bb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, left + kr, C), lambda bb, i: (i, 0, bb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K * C, 3 * n_freq), lambda bb, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3 * n_freq), lambda bb, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(W0.shape, lambda bb, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(W1.shape, lambda bb, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, P * hop), lambda bb, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bt, P * hop), lambda bb, i: (bb, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, F_sup, P * hop), jnp.float32),
        interpret=_interpret(),
    )(main, strips, w_cat, b2, jnp.asarray(W0), jnp.asarray(W1), inv_env)
    wav = out.reshape(B, S_pad)
    return jax.lax.dynamic_slice_in_dim(wav, start, (T - 1) * hop, axis=1)


def istft_pallas(real, imag, *, n_fft: int, hop: int, precision=None):
    """Pallas twin of the iSTFT head (``dispatch.istft_head`` XLA path).

    real/imag: (B, F, n_freq) -> wav (B, (F-1)*hop), centered trim.

    Super-frame formulation (``_istft_basis_sf``): P = 128//hop frames are
    one row, so every output tile is a dense (bt, P*2F)@(P*2F, 128) matmul
    pair — full-width lanes on the MXU.  The previous per-phase layout
    emitted (hop, bt) slivers and measured ~1.8% of HBM peak.
    """
    B, F, n_freq = real.shape
    P = max(1, 128 // hop)
    if (n_fft - 1) // hop + 1 > P:  # window spans > 2 super-frames: the
        # W0/W1 split no longer covers it (only n_fft > 128 heads; ours is 16)
        from styletts_zs_tpu.ops import stft as _stft
        from styletts_zs_tpu.utils.config import AudioConfig
        cfg = AudioConfig(n_fft=n_fft, win_length=n_fft, hop_length=hop)
        return _stft.istft(real, imag, cfg, center=True)
    start = n_fft // 2
    # pad frames so P divides them, the centered-trim region is covered,
    # and the super-frame count is a multiple of the kernel block (full
    # (block_t, 128) output tiles — an odd F_sup would otherwise force
    # 1-row slivers).  bt=64 measured 41% of HBM peak on v5e vs 7.8% at
    # bt=16 (scripts/probe_istft2.py); capped below for short inputs so a
    # tiny-config call doesn't pad 3 super-frames up to 64.
    extra = -(-start // hop) + 1
    F_sup = -(-(F + extra) // P)
    block_t = min(64, 1 << (F_sup - 1).bit_length())
    F_sup = -(-F_sup // block_t) * block_t
    F_pad = F_sup * P
    spec = jnp.concatenate([real, imag], axis=-1).astype(jnp.float32)
    spec = jnp.pad(spec, ((0, 0), (0, F_pad - F), (0, 0)))
    C = 2 * n_freq
    xs = spec.reshape(B, F_sup, P * C)
    S_pad = F_pad * hop
    inv_env = (1.0 / _istft_env(n_fft, hop, F, S_pad)).astype(np.float32)
    inv_env = jnp.asarray(inv_env.reshape(F_sup, P * hop))
    out = _istft_sf_impl(xs, inv_env, n_fft=n_fft, hop=hop, P=P,
                         block_t=block_t, precision=precision)
    wav = out.reshape(B, S_pad)
    return jax.lax.dynamic_slice_in_dim(wav, start, (F - 1) * hop, axis=1)
