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
    """y = conv1d(silu(adain(x, scale, shift)), kernel, dilation, SAME).

    Returns (y, mean, rstd) — the instance stats are the backward's saved
    residuals (dispatch.py routes to the dedicated backward kernels below).
    """
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
    return out[:, :T, :], mean, rstd


def adain_conv_block_pallas(x, scale, shift, kernel1, kernel2, *,
                            dilation: int = 1):
    """Fused twin of ``dispatch.adain_conv_block`` (use_pallas=False path)."""
    C = x.shape[-1]
    if scale.ndim == 2:  # global style -> broadcast over time
        scale = jnp.broadcast_to(scale[:, None, :],
                                 (x.shape[0], x.shape[1], scale.shape[-1]))
        shift = jnp.broadcast_to(shift[:, None, :],
                                 (x.shape[0], x.shape[1], shift.shape[-1]))
    h, _, _ = _mod_conv_pass(x, scale[..., :C], shift[..., :C], kernel1,
                             dilation=dilation)
    h2, _, _ = _mod_conv_pass(h, scale[..., C:], shift[..., C:], kernel2,
                              dilation=1)
    return ((x.astype(jnp.float32) + h2.astype(jnp.float32))
            * np.float32(1.0 / np.sqrt(2.0))).astype(x.dtype)


# ---------------------------------------------------------------------------
# dedicated backward (flash-style: saved stats, fused bwd-data kernels)
# ---------------------------------------------------------------------------
#
# Per fused pass  c = conv(silu(n·(1+s)+b), W, dil),  n = (x-μ)ρ:
#   da[u] = Σ_k dc[u + k·dil - halo] @ Wb[k],  Wb[k] = W[K-1-k]^T
#           (conv-bwd-data: SAME structure as the forward tap-matmul)
#   dh    = da · silu'(h_pre)                     [fused into the same kernel]
#   dn    = dh (1+s);   ds = dh n;   db = dh      [cheap XLA-fused elementwise]
#   dx    = ρ (dn - mean_T dn - n · mean_T(dn n)) [instance-norm backward]
#   dW[k] = Σ_{b,t} a[t + k·dil - halo] ⊗ dc[t]   [pure MXU einsum in XLA]
#
# The Pallas kernel below carries the hot part (tap matmuls + silu'/adain
# recompute, no da materialization); stats means, weight grads, and the
# elementwise tails are XLA-fused reductions/matmuls already at peak.


def _bwd_data_kernel(dc_ref, dch_ref, x_ref, s_ref, b_ref, mean_ref,
                     rstd_ref, wb_ref, o_ref, *, block_t: int, halo: int,
                     taps: tuple[int, ...], t_total: int):
    """dh block = (Σ_k dc_window[off_k] @ Wb[k]) · silu'(h_pre)."""
    i = pl.program_id(1)
    strip = dch_ref[0, 0, :, :]
    parts = [strip[:halo, :], dc_ref[0, :, :], strip[halo:, :]]
    window = jnp.concatenate(parts, axis=0)          # (block_t + 2*halo, Co)
    win = block_t + 2 * halo
    pos = i * block_t - halo + jax.lax.broadcasted_iota(jnp.int32, (win, 1), 0)
    window = jnp.where((pos >= 0) & (pos < t_total), window, 0.0)

    acc = jnp.zeros((block_t, o_ref.shape[-1]), jnp.float32)
    for k, off in enumerate(taps):
        acc += jax.lax.dot_general(
            window[off: off + block_t, :], wb_ref[k, :, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    x = x_ref[0, :, :].astype(jnp.float32)
    s = s_ref[0, :, :].astype(jnp.float32)
    b = b_ref[0, :, :].astype(jnp.float32)
    n = (x - mean_ref[0, 0, :][None, :]) * rstd_ref[0, 0, :][None, :]
    h_pre = n * (1.0 + s) + b
    sig = jax.nn.sigmoid(h_pre)
    dsilu = sig * (1.0 + h_pre * (1.0 - sig))
    o_ref[0, :, :] = (acc * dsilu).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("dilation", "block_t"))
def _bwd_data_mod_pass(dc, x, scale, shift, mean, rstd, kernel, *,
                       dilation: int, block_t: int = 512):
    """dh = conv_bwd_data(dc, W) · silu'(adain pre-activation of x)."""
    B, T, C_out = dc.shape
    K = kernel.shape[0]
    C_in = kernel.shape[1]
    halo = ((K - 1) * dilation) // 2
    wb = jnp.transpose(jnp.flip(kernel, axis=0), (0, 2, 1))  # (K, Co, Ci)

    bt = min(block_t, T)
    for cand in (block_t, 384, 256, 128, 64, 32, 16, 8):
        if cand <= T and T % cand == 0:
            bt = cand
            break
    n_blocks = -(-T // bt)
    T_pad = n_blocks * bt
    taps = tuple(k * dilation for k in range(K))

    if T_pad == T:
        left = (jnp.arange(n_blocks)[:, None] * bt
                + jnp.arange(-halo, 0)[None, :])
        right = (jnp.arange(n_blocks)[:, None] * bt + bt
                 + jnp.arange(halo)[None, :])
        idx = jnp.clip(jnp.concatenate([left, right], axis=1), 0, T - 1)
        dcm, dcs = dc, dc[:, idx, :]
        xm, sm, bm = x, scale, shift
    else:
        dcp = jnp.pad(dc, ((0, 0), (halo, halo + (T_pad - T)), (0, 0)))
        dcm = dcp[:, halo: halo + T_pad, :]
        dcs = _halo_strips(dcp, n_blocks, bt, halo)
        pad3 = ((0, 0), (0, T_pad - T), (0, 0))
        xm, sm, bm = (jnp.pad(a, pad3) for a in (x, scale, shift))

    kern = functools.partial(_bwd_data_kernel, block_t=bt, halo=halo,
                             taps=taps, t_total=T)
    blk = lambda b, i: (b, i, 0)            # noqa: E731
    out = pl.pallas_call(
        kern,
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec((1, bt, C_out), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2 * halo, C_out), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, C_in), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, C_in), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bt, C_in), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C_in), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, C_in), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, C_out, C_in), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bt, C_in), blk, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T_pad, C_in), dc.dtype),
        interpret=_interpret(),
    )(dcm, dcs, xm, sm, bm, mean[:, None, :], rstd[:, None, :], wb)
    return out[:, :T, :]


def _conv_wgrad(a, dc, K: int, dilation: int):
    """dW[k] = Σ_{b,t} a[b, t + k·dil - halo] ⊗ dc[b, t]  (K MXU matmuls)."""
    halo = ((K - 1) * dilation) // 2
    ap = jnp.pad(a, ((0, 0), (halo, halo), (0, 0)))
    T = dc.shape[1]
    dcf = dc.astype(jnp.float32)
    return jnp.stack([
        jnp.einsum("btc,btd->cd", ap[:, k * dilation: k * dilation + T, :]
                   .astype(jnp.float32), dcf)
        for k in range(K)], axis=0)


def _norm_bwd(dh, x, s, mean, rstd):
    """Instance-norm(+adain modulation) backward: dn -> dx; also ds, db."""
    xf = x.astype(jnp.float32)
    n = (xf - mean[:, None, :]) * rstd[:, None, :]
    dhf = dh.astype(jnp.float32)
    dn = dhf * (1.0 + s.astype(jnp.float32))
    m1 = jnp.mean(dn, axis=1, keepdims=True)
    m2 = jnp.mean(dn * n, axis=1, keepdims=True)
    dx = rstd[:, None, :] * (dn - m1 - n * m2)
    return dx, dhf * n, dhf, n


def _silu_act(n, s, b):
    h_pre = n * (1.0 + s.astype(jnp.float32)) + b.astype(jnp.float32)
    return h_pre * jax.nn.sigmoid(h_pre)


def adain_conv_block_fwd_pallas(x, scale, shift, kernel1, kernel2, *,
                                dilation: int = 1):
    """Forward returning (y, residuals); scale/shift must be (B, T, 2C)."""
    C = x.shape[-1]
    h, mean_x, rstd_x = _mod_conv_pass(x, scale[..., :C], shift[..., :C],
                                       kernel1, dilation=dilation)
    h2, mean_h, rstd_h = _mod_conv_pass(h, scale[..., C:], shift[..., C:],
                                        kernel2, dilation=1)
    y = ((x.astype(jnp.float32) + h2.astype(jnp.float32))
         * np.float32(1.0 / np.sqrt(2.0))).astype(x.dtype)
    return y, (x, scale, shift, kernel1, kernel2, h,
               mean_x, rstd_x, mean_h, rstd_h)


def adain_conv_block_fwd_xla(x, scale, shift, kernel1, kernel2, *,
                             dilation: int = 1):
    """XLA forward producing the same residuals as the Pallas fwd.

    Measured win-or-yield (scripts/tune_adain.py on the real v5e, chained
    slope timing at prod shapes B8·T1024·C512·K5): XLA's fused conv forward
    beats the Pallas fwd kernel (448 vs 534 us) while the dedicated Pallas
    BACKWARD beats the differentiated twin (890 vs 1032 us).  Dispatch
    therefore pairs this forward with ``adain_conv_block_bwd_pallas`` —
    each direction takes its measured winner.  scale/shift: (B, T, 2C).
    """
    from styletts_zs_tpu.ops import conv as conv_ops
    C = x.shape[-1]
    mean_x, rstd_x = _instance_stats(x)
    n_x = (x.astype(jnp.float32) - mean_x[:, None, :]) * rstd_x[:, None, :]
    a0 = _silu_act(n_x, scale[..., :C], shift[..., :C]).astype(x.dtype)
    h = conv_ops.conv1d(a0, kernel1, dilation=dilation)
    mean_h, rstd_h = _instance_stats(h)
    n_h = (h.astype(jnp.float32) - mean_h[:, None, :]) * rstd_h[:, None, :]
    a1 = _silu_act(n_h, scale[..., C:], shift[..., C:]).astype(h.dtype)
    h2 = conv_ops.conv1d(a1, kernel2, dilation=1)
    y = ((x.astype(jnp.float32) + h2.astype(jnp.float32))
         * np.float32(1.0 / np.sqrt(2.0))).astype(x.dtype)
    return y, (x, scale, shift, kernel1, kernel2, h,
               mean_x, rstd_x, mean_h, rstd_h)


def adain_conv_block_bwd_pallas(res, g, *, dilation: int = 1):
    """-> (dx, dscale, dshift, dkernel1, dkernel2); see derivation above."""
    x, scale, shift, k1, k2, h, mean_x, rstd_x, mean_h, rstd_h = res
    C = x.shape[-1]
    K1, K2 = k1.shape[0], k2.shape[0]
    s1, s2 = scale[..., :C], scale[..., C:]
    b1, b2 = shift[..., :C], shift[..., C:]
    inv_sqrt2 = np.float32(1.0 / np.sqrt(2.0))
    dc2 = (g.astype(jnp.float32) * inv_sqrt2).astype(g.dtype)

    # pass 2 (dilation 1): dh2 -> dc1, ds2, db2, dW2
    dh2 = _bwd_data_mod_pass(dc2, h, s2, b2, mean_h, rstd_h, k2, dilation=1)
    dc1_f, ds2, db2, n_h = _norm_bwd(dh2, h, s2, mean_h, rstd_h)
    dc1 = dc1_f.astype(g.dtype)
    a1 = _silu_act(n_h, s2, b2)
    dW2 = _conv_wgrad(a1, dc2, K2, 1)

    # pass 1 (dilated): dh1 -> dx, ds1, db1, dW1
    dh1 = _bwd_data_mod_pass(dc1, x, s1, b1, mean_x, rstd_x, k1,
                             dilation=dilation)
    dx_n, ds1, db1, n_x = _norm_bwd(dh1, x, s1, mean_x, rstd_x)
    a0 = _silu_act(n_x, s1, b1)
    dW1 = _conv_wgrad(a0, dc1, K1, dilation)

    dx = (g.astype(jnp.float32) * inv_sqrt2 + dx_n).astype(x.dtype)
    dscale = jnp.concatenate([ds1, ds2], axis=-1).astype(scale.dtype)
    dshift = jnp.concatenate([db1, db2], axis=-1).astype(shift.dtype)
    return dx, dscale, dshift, dW1.astype(k1.dtype), dW2.astype(k2.dtype)
