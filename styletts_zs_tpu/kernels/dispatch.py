"""Pallas/XLA dispatch: every hot op has a Pallas kernel and an XLA twin.

``use_pallas=False`` selects the XLA twin — the CPU-golden numerics path
(``BASELINE.json:7``); ``True`` selects the hand-written Pallas kernel
(``BASELINE.json:5``).  Both paths share one signature here so models never
branch on backend themselves (SURVEY.md §2.3: "Every Pallas kernel must have
an XLA-composed twin behind one switch").
"""
from __future__ import annotations

import jax

from styletts_zs_tpu.ops import attention as attn_ops


def local_attention(q: jax.Array, k: jax.Array, v: jax.Array, *, chunk: int,
                    kv_mask: jax.Array | None = None,
                    use_pallas: bool = False) -> jax.Array:
    """Chunk-local self-attention (B, T, H, D); chunks attend to ±1 neighbors."""
    if use_pallas:
        from styletts_zs_tpu.kernels import attention_kernel
        return attention_kernel.local_attention_pallas(
            q, k, v, chunk=chunk, kv_mask=kv_mask)
    return attn_ops.local_attention(q, k, v, chunk=chunk, kv_mask=kv_mask)


def full_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                   kv_mask: jax.Array | None = None,
                   use_pallas: bool = False) -> jax.Array:
    """Full (cross- or self-) attention (B, Tq, H, D) x (B, Tk, H, D)."""
    if use_pallas:
        from styletts_zs_tpu.kernels import attention_kernel
        return attention_kernel.full_attention_pallas(q, k, v, kv_mask=kv_mask)
    return attn_ops.cross_attention(q, k, v, kv_mask=kv_mask)


def adain_conv_block(x, scale, shift, kernel1, kernel2, *, dilation: int = 1,
                     use_pallas: bool = False):
    """Fused AdaIN → conv → snake-ish activation → AdaIN → conv residual block."""
    if use_pallas:
        from styletts_zs_tpu.kernels import decoder_kernels
        return decoder_kernels.adain_conv_block_pallas(
            x, scale, shift, kernel1, kernel2, dilation=dilation)
    from styletts_zs_tpu.ops import conv as conv_ops
    from styletts_zs_tpu.ops import norm as norm_ops
    import jax.numpy as jnp
    C = x.shape[-1]
    h = norm_ops.adain(x, scale[..., :C], shift[..., :C])
    h = jax.nn.silu(h)
    h = conv_ops.conv1d(h, kernel1, dilation=dilation)
    h = norm_ops.adain(h, scale[..., C:], shift[..., C:])
    h = jax.nn.silu(h)
    h = conv_ops.conv1d(h, kernel2, dilation=1)
    import numpy as np
    return ((x.astype(jnp.float32) + h.astype(jnp.float32))
            * np.float32(1.0 / np.sqrt(2.0))).astype(x.dtype)


def conv_transpose1d(x, kernel, *, stride: int, use_pallas: bool = False):
    """Vocoder upsampling transposed conv."""
    if use_pallas:
        from styletts_zs_tpu.kernels import vocoder_kernels
        return vocoder_kernels.conv_transpose1d_pallas(x, kernel, stride=stride)
    from styletts_zs_tpu.ops import conv as conv_ops
    return conv_ops.conv_transpose1d(x, kernel, stride=stride)


def istft_head(real, imag, *, n_fft: int, hop: int, use_pallas: bool = False):
    """iSTFT overlap-add synthesis for the vocoder head."""
    if use_pallas:
        from styletts_zs_tpu.kernels import vocoder_kernels
        return vocoder_kernels.istft_pallas(real, imag, n_fft=n_fft, hop=hop)
    from styletts_zs_tpu.ops import stft as stft_ops
    from styletts_zs_tpu.utils.config import AudioConfig
    cfg = AudioConfig(n_fft=n_fft, win_length=n_fft, hop_length=hop)
    return stft_ops.istft(real, imag, cfg, center=True)
