"""Pallas/XLA dispatch: every hot op has a Pallas kernel and an XLA twin.

``use_pallas=False`` selects the XLA twin — the CPU-golden numerics path
(``BASELINE.json:7``); ``True`` selects the hand-written Pallas kernel
(``BASELINE.json:5``).  Both paths share one signature here so models never
branch on backend themselves (SURVEY.md §2.3: "Every Pallas kernel must have
an XLA-composed twin behind one switch").

Autodiff: every Pallas kernel carries a custom VJP.  Chunk-local attention
and the fused AdaIN-conv block have DEDICATED Pallas backward kernels
(flash-style dq/dk/dv with saved log-sum-exp; saved-stats dX/dscale/dshift/
dW for the conv block); the remaining ops (full attention, transposed conv,
iSTFT) re-derive the gradient through the XLA twin (numerically
interchangeable — the twins are allclose-gated), which is already the fast
path for those shapes.  Training works with ``use_pallas=True`` throughout.

WIN-OR-YIELD routing (VERDICT r1 item 4): ``use_pallas=True`` means "use
the measured winner per kernel and direction", so it never selects a path
slower than the twin.  Measured on the real v5e with chained slope timing
(scripts/tune_adain.py, scripts/kernel_bench.py; prod shapes):

  kernel               direction  winner   routing under use_pallas=True
  chunk-local attn     fwd+bwd    Pallas   Pallas fwd + flash-style bwd
  full attn (short Tk) fwd+bwd    XLA      XLA twin (Pallas measured 0.4x)
  AdaIN conv block     fwd        XLA      XLA fwd (448 vs 534 us)
  AdaIN conv block     bwd        Pallas   dedicated bwd (890 vs 1032 us)
  transposed conv      fwd+bwd    XLA      XLA twin (162 vs 290 us fwd)
  iSTFT overlap-add    fwd        Pallas   Pallas super-frame kernel
  sampler CFG tail     fwd        Pallas   Pallas fused step
  synthesis head       fwd        Pallas   fused leaky+conv+epilogue+OLA
                                           (1.44 vs 4.75 ms at B8x25600,
                                           scripts/probe_synth_head.py;
                                           subsumes the istft row in prod)
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from styletts_zs_tpu.ops import attention as attn_ops


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _local_attention_ad(chunk: int, has_mask: bool, pallas_bwd: bool):
    from styletts_zs_tpu.kernels import attention_kernel

    @jax.custom_vjp
    def f(q, k, v, mask):
        return attention_kernel.local_attention_pallas(
            q, k, v, chunk=chunk, kv_mask=mask if has_mask else None)

    if pallas_bwd:
        # dedicated flash-style backward kernels (chunk lane-aligned)
        def fwd(q, k, v, mask):
            out, res = attention_kernel.local_attention_fwd_pallas(
                q, k, v, chunk=chunk, kv_mask=mask if has_mask else None)
            return out, res

        def bwd(res, g):
            dq, dk, dv = attention_kernel.local_attention_bwd_pallas(
                res, g, chunk=chunk)
            return dq, dk, dv, None
    else:
        def fwd(q, k, v, mask):
            return f(q, k, v, mask), (q, k, v, mask)

        def bwd(res, g):
            q, k, v, mask = res
            _, vjp = jax.vjp(
                lambda q, k, v: attn_ops.local_attention(
                    q, k, v, chunk=chunk, kv_mask=mask if has_mask else None),
                q, k, v)
            dq, dk, dv = vjp(g)
            return dq, dk, dv, None

    f.defvjp(fwd, bwd)
    return f


def local_attention(q: jax.Array, k: jax.Array, v: jax.Array, *, chunk: int,
                    kv_mask: jax.Array | None = None,
                    use_pallas: bool = False) -> jax.Array:
    """Chunk-local self-attention (B, T, H, D); chunks attend to ±1 neighbors."""
    if use_pallas:
        has_mask = kv_mask is not None
        mask = kv_mask if has_mask else jnp.ones(q.shape[:2], bool)
        T = q.shape[1]
        pallas_bwd = (chunk % 128 == 0 and T % chunk == 0 and T >= 3 * chunk)
        return _local_attention_ad(chunk, has_mask, pallas_bwd)(q, k, v, mask)
    return attn_ops.local_attention(q, k, v, chunk=chunk, kv_mask=kv_mask)


@functools.lru_cache(maxsize=None)
def _full_attention_ad(has_mask: bool):
    from styletts_zs_tpu.kernels import attention_kernel

    @jax.custom_vjp
    def f(q, k, v, mask):
        return attention_kernel.full_attention_pallas(
            q, k, v, kv_mask=mask if has_mask else None)

    def fwd(q, k, v, mask):
        return f(q, k, v, mask), (q, k, v, mask)

    def bwd(res, g):
        q, k, v, mask = res
        _, vjp = jax.vjp(
            lambda q, k, v: attn_ops.cross_attention(
                q, k, v, kv_mask=mask if has_mask else None), q, k, v)
        dq, dk, dv = vjp(g)
        return dq, dk, dv, None

    f.defvjp(fwd, bwd)
    return f


def full_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                   kv_mask: jax.Array | None = None,
                   use_pallas: bool = False) -> jax.Array:
    """Full (cross- or self-) attention (B, Tq, H, D) x (B, Tk, H, D).

    Measured YIELD (module docstring table): at the short-context shapes
    this op serves (prompt tokens, style codes, text cross-attention) the
    Pallas kernel measured 0.4x the XLA twin with the chained slope timer
    on v5e — the contexts are too small to amortize the kernel's VMEM
    staging, and XLA fuses the softmax chain well here.  ``use_pallas=True``
    therefore routes to the twin.  ``_full_attention_ad`` keeps the
    Pallas+custom-VJP path callable for parity tests and re-measurement.
    """
    return attn_ops.cross_attention(q, k, v, kv_mask=kv_mask)


# ---------------------------------------------------------------------------
# fused AdaIN conv block
# ---------------------------------------------------------------------------

def _adain_conv_xla(x, scale, shift, kernel1, kernel2, *, dilation: int):
    from styletts_zs_tpu.ops import conv as conv_ops
    from styletts_zs_tpu.ops import norm as norm_ops
    C = x.shape[-1]
    h = norm_ops.adain(x, scale[..., :C], shift[..., :C])
    h = jax.nn.silu(h)
    h = conv_ops.conv1d(h, kernel1, dilation=dilation)
    h = norm_ops.adain(h, scale[..., C:], shift[..., C:])
    h = jax.nn.silu(h)
    h = conv_ops.conv1d(h, kernel2, dilation=1)
    return ((x.astype(jnp.float32) + h.astype(jnp.float32))
            * np.float32(1.0 / np.sqrt(2.0))).astype(x.dtype)


@functools.lru_cache(maxsize=None)
def _adain_conv_ad(dilation: int, pallas_bwd: bool):
    from styletts_zs_tpu.kernels import decoder_kernels

    if pallas_bwd:
        # production route: measured winner per direction — XLA forward
        # (beats the Pallas fwd kernel at prod shapes) + dedicated Pallas
        # backward (saved instance stats + fused conv-bwd-data passes;
        # decoder_kernels derivation comment)
        @jax.custom_vjp
        def f(x, scale, shift, k1, k2):
            return _adain_conv_xla(x, scale, shift, k1, k2,
                                   dilation=dilation)

        def fwd(x, scale, shift, k1, k2):
            return decoder_kernels.adain_conv_block_fwd_xla(
                x, scale, shift, k1, k2, dilation=dilation)

        def bwd(res, g):
            return decoder_kernels.adain_conv_block_bwd_pallas(
                res, g, dilation=dilation)
    else:
        # benchmark/parity route: the Pallas fwd kernel with the
        # XLA-twin backward
        @jax.custom_vjp
        def f(x, scale, shift, k1, k2):
            return decoder_kernels.adain_conv_block_pallas(
                x, scale, shift, k1, k2, dilation=dilation)

        def fwd(x, scale, shift, k1, k2):
            return f(x, scale, shift, k1, k2), (x, scale, shift, k1, k2)

        def bwd(res, g):
            _, vjp = jax.vjp(
                functools.partial(_adain_conv_xla, dilation=dilation), *res)
            return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def adain_conv_block(x, scale, shift, kernel1, kernel2, *, dilation: int = 1,
                     use_pallas: bool = False):
    """Fused AdaIN → SiLU → conv ×2 residual block (decoder hot path)."""
    # the fused kernels assume a symmetric conv halo ((K-1)*dil even —
    # always true for the K=5 blocks the models build); anything else is a
    # degenerate size where the XLA twin is the correct path
    symmetric = (((kernel1.shape[0] - 1) * dilation) % 2 == 0
                 and (kernel2.shape[0] - 1) % 2 == 0)
    if use_pallas and symmetric:
        if scale.ndim == 2:  # global style: broadcast OUTSIDE the custom
            # VJP so autodiff inserts the sum-over-T cotangent itself
            tgt = (x.shape[0], x.shape[1], scale.shape[-1])
            scale = jnp.broadcast_to(scale[:, None, :], tgt)
            shift = jnp.broadcast_to(shift[:, None, :], tgt)
        return _adain_conv_ad(dilation, True)(x, scale, shift,
                                              kernel1, kernel2)
    return _adain_conv_xla(x, scale, shift, kernel1, kernel2,
                           dilation=dilation)


# ---------------------------------------------------------------------------
# vocoder ops
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _conv_transpose_ad(stride: int):
    from styletts_zs_tpu.kernels import vocoder_kernels
    from styletts_zs_tpu.ops import conv as conv_ops

    @jax.custom_vjp
    def f(x, kernel):
        return vocoder_kernels.conv_transpose1d_pallas(x, kernel,
                                                       stride=stride)

    def fwd(x, kernel):
        return f(x, kernel), (x, kernel)

    def bwd(res, g):
        x, kernel = res
        _, vjp = jax.vjp(
            lambda x, k: conv_ops.conv_transpose1d(x, k, stride=stride),
            x, kernel)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def conv_transpose1d(x, kernel, *, stride: int, use_pallas: bool = False):
    """Vocoder upsampling transposed conv.

    Measured YIELD (module docstring table): XLA's native transposed conv
    beats the Pallas shift-matmul kernel at prod shapes (162 vs 290 us,
    B8·T1024·512→256·K10·r5, chained slope timing on v5e), so
    ``use_pallas=True`` routes to the XLA twin.  The Pallas kernel stays
    allclose-gated (tests); the iSTFT head uses its own super-frame
    kernel (vocoder_kernels._istft_sf_impl) rather than this one.
    ``_conv_transpose_ad`` keeps the Pallas+custom-VJP path callable for
    parity tests and re-measurement.
    """
    from styletts_zs_tpu.ops import conv as conv_ops
    return conv_ops.conv_transpose1d(x, kernel, stride=stride)


@functools.lru_cache(maxsize=None)
def _istft_ad(n_fft: int, hop: int):
    from styletts_zs_tpu.kernels import vocoder_kernels
    from styletts_zs_tpu.ops import stft as stft_ops
    from styletts_zs_tpu.utils.config import AudioConfig
    cfg = AudioConfig(n_fft=n_fft, win_length=n_fft, hop_length=hop)

    @jax.custom_vjp
    def f(real, imag):
        return vocoder_kernels.istft_pallas(real, imag, n_fft=n_fft, hop=hop)

    def fwd(real, imag):
        return f(real, imag), (real, imag)

    def bwd(res, g):
        real, imag = res
        _, vjp = jax.vjp(
            lambda r, i: stft_ops.istft(r, i, cfg, center=True), real, imag)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def istft_head(real, imag, *, n_fft: int, hop: int, use_pallas: bool = False):
    """iSTFT overlap-add synthesis for the vocoder head."""
    if use_pallas:
        return _istft_ad(n_fft, hop)(real, imag)
    from styletts_zs_tpu.ops import stft as stft_ops
    from styletts_zs_tpu.utils.config import AudioConfig
    cfg = AudioConfig(n_fft=n_fft, win_length=n_fft, hop_length=hop)
    return stft_ops.istft(real, imag, cfg, center=True)


def _synthesis_head_xla(x, w, b, *, n_fft: int, hop: int):
    """XLA twin of the fused synthesis head — the exact op composition the
    vocoder used before fusion (leaky_relu -> SAME conv + bias in the
    compute dtype -> fp32 mag/phase epilogue -> centered iSTFT)."""
    from styletts_zs_tpu.ops import conv as conv_ops
    n_freq = n_fft // 2 + 1
    h = jax.nn.leaky_relu(x, 0.1)
    head = conv_ops.conv1d(h, w.astype(x.dtype)) + b.astype(x.dtype)
    logmag, pc, ps = jnp.split(head, 3, axis=-1)
    mag = jnp.exp(jnp.clip(logmag.astype(jnp.float32), -12.0, 6.0))
    norm = jax.lax.rsqrt(pc.astype(jnp.float32) ** 2
                         + ps.astype(jnp.float32) ** 2 + 1e-7)
    real = mag * pc.astype(jnp.float32) * norm
    imag = mag * ps.astype(jnp.float32) * norm
    return istft_head(real, imag, n_fft=n_fft, hop=hop, use_pallas=False)


@functools.lru_cache(maxsize=None)
def _synthesis_head_ad(n_fft: int, hop: int):
    from styletts_zs_tpu.kernels import vocoder_kernels

    @jax.custom_vjp
    def f(x, w, b):
        return vocoder_kernels.synthesis_head_pallas(x, w, b, n_fft=n_fft,
                                                     hop=hop)

    def fwd(x, w, b):
        return f(x, w, b), (x, w, b)

    def bwd(res, g):
        _, vjp = jax.vjp(
            functools.partial(_synthesis_head_xla, n_fft=n_fft, hop=hop),
            *res)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def synthesis_head(x, w, b, *, n_fft: int, hop: int,
                   use_pallas: bool = False):
    """Fused vocoder synthesis head: activations -> waveform.

    x: (B, T, C) pre-activation MRF output; w: (K, C, 3*n_freq); b:
    (3*n_freq,).  Fuses leaky_relu + head conv + mag/phase epilogue +
    super-frame iSTFT overlap-add into one Pallas kernel (the unfused path
    round-trips three lane-padded narrow tensors through HBM — STATUS.md
    round-2 "iSTFT compound is layout-bound" gap).  Returns (B, (T-1)*hop)
    float32.
    """
    from styletts_zs_tpu.kernels import vocoder_kernels
    if use_pallas and vocoder_kernels.synthesis_head_supported(
            n_fft=n_fft, hop=hop, K=w.shape[0], channels=x.shape[-1],
            dtype=x.dtype):
        return _synthesis_head_ad(n_fft, hop)(x, w, b)
    return _synthesis_head_xla(x, w, b, n_fft=n_fft, hop=hop)
