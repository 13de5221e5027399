"""1-D convolution primitives in (B, T, C) layout.

Channels-last keeps C on the TPU lane dimension (128-wide) so XLA tiles the
convs onto the MXU.  All functions are pure; parameters are passed explicitly
so the same code serves Flax modules and Pallas twins.

No reference code exists (``/root/reference/README.md`` is the whole repo);
these realize the ops-layer obligations of SURVEY.md §1.2 L1.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def conv1d(x: jax.Array, kernel: jax.Array, *, stride: int = 1,
           dilation: int = 1, padding: str | int = "SAME",
           groups: int = 1) -> jax.Array:
    """x: (B, T, C_in), kernel: (K, C_in // groups, C_out) -> (B, T', C_out)."""
    if isinstance(padding, int):
        pad = [(padding, padding)]
    elif padding == "SAME":
        k_eff = (kernel.shape[0] - 1) * dilation + 1
        pad = [(k_eff // 2, k_eff - 1 - k_eff // 2)]
    elif padding == "CAUSAL":
        k_eff = (kernel.shape[0] - 1) * dilation + 1
        pad = [(k_eff - 1, 0)]
    else:
        pad = padding
    # NOTE: no preferred_element_type here — a mixed-precision conv (bf16 in,
    # f32 out) has no transpose rule, breaking gradients.  TPU MXU convs
    # accumulate in fp32 internally regardless; fp32 inputs are exact.
    kernel = kernel.astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=(stride,), padding=pad,
        rhs_dilation=(dilation,), dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
    ).astype(x.dtype)


def conv_transpose1d(x: jax.Array, kernel: jax.Array, *, stride: int,
                     padding: int | None = None) -> jax.Array:
    """Transposed 1-D conv (vocoder upsampling). x: (B, T, C_in),
    kernel: (K, C_in, C_out) -> (B, T*stride, C_out) with HiFi-GAN-style
    padding (K - stride) // 2 on each side of the full output.

    This is the XLA twin of the Pallas transposed-conv kernel
    (styletts_zs_tpu/kernels/vocoder_kernels.py); both must agree.
    """
    K = kernel.shape[0]
    if padding is None:
        padding = (K - stride) // 2
    full = jax.lax.conv_transpose(
        x, kernel, strides=(stride,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
    )  # (B, (T-1)*stride + K, C_out)
    out = full[:, padding: full.shape[1] - (K - stride - padding), :]
    return out.astype(x.dtype)


def depthwise_conv1d(x: jax.Array, kernel: jax.Array, *,
                     dilation: int = 1, padding: str = "SAME") -> jax.Array:
    """x: (B, T, C), kernel: (K, 1, C) -> (B, T, C)."""
    return conv1d(x, kernel, dilation=dilation, padding=padding,
                  groups=x.shape[-1])
