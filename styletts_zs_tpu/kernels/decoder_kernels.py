"""Pallas TPU kernel: fused AdaIN -> SiLU -> dilated conv decoder block.

The "conv decoder blocks (dilated conv1d + AdaIN fusion)" obligation of
``BASELINE.json:5`` (SURVEY.md §2.3).  The block

    h = conv1(silu(adain(x, s1, b1)), dilation)
    y = (x + conv2(silu(adain(h, s2, b2)))) / sqrt(2)

runs as two fused Pallas passes (modulate + activation + K tap-matmuls on the
MXU per pass); the instance-norm statistics — a cheap global-T reduction XLA
handles well — are computed between passes.  Elementwise traffic (normalize,
modulate, SiLU, mask) never round-trips to HBM.

Blocking: the time axis is tiled in ``block_t`` frames; conv halos are
delivered as precomputed per-block halo strips so VMEM use is independent of
sequence length (60 s long-form safe, ``BASELINE.json:10``).

Matches ``dispatch.adain_conv_block`` (XLA twin) allclose; tests gate this.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _instance_stats(x: jax.Array, eps: float = 1e-5):
    """fp32 mean/rstd over the time axis; matches ops.norm.instance_norm."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=1)                      # (B, C)
    var = jnp.var(xf, axis=1)
    return mean, jax.lax.rsqrt(var + eps)


def _mod_conv_kernel(x_ref, xh_ref, sc_ref, sch_ref, sh_ref, shh_ref,
                     mean_ref, rstd_ref, w_ref, o_ref, *, block_t: int,
                     halo: int, taps: tuple[int, ...], t_total: int):
    """One fused pass: adain-modulate + SiLU + masked dilated tap-conv.

    x_ref: (1, block_t, C) main block; xh_ref: (1, 1, 2*halo, C) halo strip
    [left | right]; likewise for scale (sc) and shift (sh).  o_ref is the
    (1, block_t, C_out) output block; w_ref is (K, C, C_out).
    """
    i = pl.program_id(1)

    def window(main, strip):
        return jnp.concatenate(
            [strip[0, 0, :halo, :], main[0, :, :], strip[0, 0, halo:, :]],
            axis=0).astype(jnp.float32)

    x = window(x_ref, xh_ref)          # (block_t + 2*halo, C)
    sc = window(sc_ref, sch_ref)
    sh = window(sh_ref, shh_ref)
    mean = mean_ref[0, 0, :][None, :]
    rstd = rstd_ref[0, 0, :][None, :]

    h = (x - mean) * rstd * (1.0 + sc) + sh
    h = h * jax.nn.sigmoid(h)  # SiLU
    # zero halo positions outside the real sequence (SAME zero-padding)
    win = block_t + 2 * halo
    pos = i * block_t - halo + jax.lax.broadcasted_iota(jnp.int32, (win, 1), 0)
    h = jnp.where((pos >= 0) & (pos < t_total), h, 0.0).astype(w_ref.dtype)

    acc = jnp.zeros((block_t, o_ref.shape[-1]), jnp.float32)
    for k, off in enumerate(taps):
        acc += jax.lax.dot_general(
            h[off: off + block_t, :], w_ref[k, :, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[0, :, :] = acc.astype(o_ref.dtype)


def _halo_strips(xp: jax.Array, n_blocks: int, block_t: int, halo: int):
    """xp: (B, T_pad + 2*halo, C) zero-padded -> (B, n_blocks, 2*halo, C).

    Strip i = [xp[i*bt : i*bt + halo] | xp[(i+1)*bt + halo : (i+1)*bt + 2*halo]]
    i.e. the left and right conv halos of block i (in padded coordinates the
    block occupies [i*bt + halo, (i+1)*bt + halo)).
    """
    left = jnp.arange(n_blocks)[:, None] * block_t + jnp.arange(halo)[None, :]
    right = left + block_t + halo
    idx = jnp.concatenate([left, right], axis=1)      # (n, 2*halo)
    return xp[:, idx, :]


@functools.partial(jax.jit, static_argnames=("dilation", "block_t"))
def _mod_conv_pass(x, scale, shift, kernel, *, dilation: int,
                   block_t: int = 512):
    """y = conv1d(silu(adain(x, scale, shift)), kernel, dilation, SAME)."""
    B, T, C = x.shape
    K = kernel.shape[0]
    halo = ((K - 1) * dilation) // 2
    mean, rstd = _instance_stats(x)

    # prefer a block size that divides T: the main blocks are then x itself
    # (no whole-array pad copy) and halos come from a clamped gather — the
    # kernel masks out-of-range halo positions anyway
    bt = min(block_t, T)
    for cand in (block_t, 384, 256, 128, 64, 32, 16, 8):
        if cand <= T and T % cand == 0:
            bt = cand
            break
    n_blocks = -(-T // bt)
    T_pad = n_blocks * bt
    taps = tuple(k * dilation for k in range(K))
    C_out = kernel.shape[2]

    if T_pad == T:
        # halo positions of block i: [i*bt - halo, i*bt) and
        # [(i+1)*bt, (i+1)*bt + halo), clamped into [0, T)
        left = (jnp.arange(n_blocks)[:, None] * bt
                + jnp.arange(-halo, 0)[None, :])
        right = (jnp.arange(n_blocks)[:, None] * bt + bt
                 + jnp.arange(halo)[None, :])
        idx = jnp.clip(jnp.concatenate([left, right], axis=1), 0, T - 1)

        def prep(a):
            return a, a[:, idx, :]
    else:
        def prep(a):
            ap = jnp.pad(a, ((0, 0), (halo, halo + (T_pad - T)), (0, 0)))
            main = ap[:, halo: halo + T_pad, :]
            strips = _halo_strips(ap, n_blocks, bt, halo)
            return main, strips

    xm, xs = prep(x)
    scm, scs = prep(scale)
    shm, shs = prep(shift)

    kern = functools.partial(_mod_conv_kernel, block_t=bt, halo=halo,
                             taps=taps, t_total=T)
    blk = lambda b, i: (b, i, 0)            # noqa: E731
    blk4 = lambda b, i: (b, i, 0, 0)        # noqa: E731
    out = pl.pallas_call(
        kern,
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec((1, bt, C), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * halo, C), blk4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, C), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * halo, C), blk4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, C), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * halo, C), blk4, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C, C_out), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bt, C_out), blk, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T_pad, C_out), x.dtype),
        interpret=_interpret(),
    )(xm, xs, scm, scs, shm, shs, mean[:, None, :], rstd[:, None, :], kernel)
    return out[:, :T, :]


def adain_conv_block_pallas(x, scale, shift, kernel1, kernel2, *,
                            dilation: int = 1):
    """Fused twin of ``dispatch.adain_conv_block`` (use_pallas=False path)."""
    C = x.shape[-1]
    if scale.ndim == 2:  # global style -> broadcast over time
        scale = jnp.broadcast_to(scale[:, None, :],
                                 (x.shape[0], x.shape[1], scale.shape[-1]))
        shift = jnp.broadcast_to(shift[:, None, :],
                                 (x.shape[0], x.shape[1], shift.shape[-1]))
    h = _mod_conv_pass(x, scale[..., :C], shift[..., :C], kernel1,
                       dilation=dilation)
    h2 = _mod_conv_pass(h, scale[..., C:], shift[..., C:], kernel2,
                        dilation=1)
    return ((x.astype(jnp.float32) + h2.astype(jnp.float32))
            * np.float32(1.0 / np.sqrt(2.0))).astype(x.dtype)
