"""AdaIN-conv kernel tuning sweep on the real chip (VERDICT r1 item 4/5).

Measures forward variants of the fused AdaIN->SiLU->conv block and the
dedicated backward vs the XLA twin, at prod shapes, slope-timed.  The
winning variant gets folded into ``kernels/decoder_kernels.py``.

Run (TPU, one process at a time!):  python scripts/tune_adain.py
"""
from __future__ import annotations

import functools
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from styletts_zs_tpu.kernels import decoder_kernels as DK          # noqa: E402
from styletts_zs_tpu.kernels import dispatch                        # noqa: E402
from styletts_zs_tpu.utils import metrics as metrics_lib            # noqa: E402

V5E_BF16_TFLOPS = 394e12


def _rand(shape, seed=0, dtype=jnp.bfloat16, scale=1.0):
    x = np.random.default_rng(seed).standard_normal(shape) * scale
    return jnp.asarray(x.astype(np.float32)).astype(dtype)


# --- variant 1: concat-taps -> ONE big matmul per block ---------------------

def _mod_conv_kernel_cat(x_ref, xh_ref, sc_ref, sch_ref, sh_ref, shh_ref,
                         mean_ref, rstd_ref, w_ref, o_ref, *, block_t: int,
                         halo: int, taps: tuple, t_total: int):
    i = pl.program_id(1)

    def window(main, strip):
        return jnp.concatenate(
            [strip[0, 0, :halo, :], main[0, :, :], strip[0, 0, halo:, :]],
            axis=0).astype(jnp.float32)

    x = window(x_ref, xh_ref)
    sc = window(sc_ref, sch_ref)
    sh = window(sh_ref, shh_ref)
    mean = mean_ref[0, 0, :][None, :]
    rstd = rstd_ref[0, 0, :][None, :]
    h = (x - mean) * rstd * (1.0 + sc) + sh
    h = h * jax.nn.sigmoid(h)
    win = block_t + 2 * halo
    pos = i * block_t - halo + jax.lax.broadcasted_iota(jnp.int32, (win, 1), 0)
    h = jnp.where((pos >= 0) & (pos < t_total), h, 0.0).astype(w_ref.dtype)

    hcat = jnp.concatenate([h[off: off + block_t, :] for off in taps], axis=1)
    acc = jax.lax.dot_general(hcat, w_ref[:, :],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[0, :, :] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("dilation", "block_t"))
def _mod_conv_pass_cat(x, scale, shift, kernel, *, dilation: int,
                       block_t: int = 512):
    B, T, C = x.shape
    K = kernel.shape[0]
    halo = ((K - 1) * dilation) // 2
    mean, rstd = DK._instance_stats(x)
    bt = min(block_t, T)
    for cand in (block_t, 384, 256, 128, 64, 32, 16, 8):
        if cand <= T and T % cand == 0:
            bt = cand
            break
    n_blocks = -(-T // bt)
    taps = tuple(k * dilation for k in range(K))
    C_out = kernel.shape[2]
    assert n_blocks * bt == T
    left = jnp.arange(n_blocks)[:, None] * bt + jnp.arange(-halo, 0)[None, :]
    right = jnp.arange(n_blocks)[:, None] * bt + bt + jnp.arange(halo)[None, :]
    idx = jnp.clip(jnp.concatenate([left, right], axis=1), 0, T - 1)

    def prep(a):
        return a, a[:, idx, :]

    xm, xs = prep(x)
    scm, scs = prep(scale)
    shm, shs = prep(shift)
    w_cat = kernel.reshape(K * C, C_out)
    kern = functools.partial(_mod_conv_kernel_cat, block_t=bt, halo=halo,
                             taps=taps, t_total=T)
    blk = lambda b, i: (b, i, 0)        # noqa: E731
    blk4 = lambda b, i: (b, i, 0, 0)    # noqa: E731
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
            pl.BlockSpec((K * C, C_out), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bt, C_out), blk, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, C_out), x.dtype),
        interpret=jax.default_backend() != "tpu",
    )(xm, xs, scm, scs, shm, shs, mean[:, None, :], rstd[:, None, :], w_cat)
    return out


def block_cat(x, scale, shift, k1, k2, *, dilation, block_t):
    C = x.shape[-1]
    h = _mod_conv_pass_cat(x, scale[..., :C], shift[..., :C], k1,
                           dilation=dilation, block_t=block_t)
    h2 = _mod_conv_pass_cat(h, scale[..., C:], shift[..., C:], k2,
                            dilation=1, block_t=block_t)
    return ((x.astype(jnp.float32) + h2.astype(jnp.float32))
            * np.float32(1.0 / np.sqrt(2.0))).astype(x.dtype)


def block_v0(x, scale, shift, k1, k2, *, dilation, block_t):
    C = x.shape[-1]
    h, _, _ = DK._mod_conv_pass(x, scale[..., :C], shift[..., :C], k1,
                                dilation=dilation, block_t=block_t)
    h2, _, _ = DK._mod_conv_pass(h, scale[..., C:], shift[..., C:], k2,
                                 dilation=1, block_t=block_t)
    return ((x.astype(jnp.float32) + h2.astype(jnp.float32))
            * np.float32(1.0 / np.sqrt(2.0))).astype(x.dtype)


def main():
    print(json.dumps({"backend": jax.default_backend()}))
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    B, T, C, K, dil = (8, 1024, 512, 5, 3) if on_tpu else (2, 128, 32, 5, 3)
    x = _rand((B, T, C), 0, dtype)
    sc = _rand((B, T, 2 * C), 1, dtype, .2)
    sh = _rand((B, T, 2 * C), 2, dtype, .2)
    k1 = _rand((K, C, C), 3, dtype, .05)
    k2 = _rand((K, C, C), 4, dtype, .05)
    flops = 2 * B * T * K * C * C * 2

    variants = {
        "xla_twin": jax.jit(lambda *a: dispatch.adain_conv_block(
            *a, dilation=dil, use_pallas=False)),
        "v0_bt512": jax.jit(lambda *a: block_v0(*a, dilation=dil,
                                                block_t=512)),
        "v0_bt256": jax.jit(lambda *a: block_v0(*a, dilation=dil,
                                                block_t=256)),
        "cat_bt512": jax.jit(lambda *a: block_cat(*a, dilation=dil,
                                                  block_t=512)),
        "cat_bt256": jax.jit(lambda *a: block_cat(*a, dilation=dil,
                                                  block_t=256)),
        "cat_bt128": jax.jit(lambda *a: block_cat(*a, dilation=dil,
                                                  block_t=128)),
    }
    ref = None
    for name, fn in variants.items():
        out = fn(x, sc, sh, k1, k2)
        if ref is None:
            ref = np.asarray(out, np.float32)
        else:
            err = float(np.abs(np.asarray(out, np.float32) - ref).max())
            assert err < 0.1, f"{name} mismatch {err}"
        t = metrics_lib.slope_time(fn, (x, sc, sh, k1, k2), k_lo=5, k_hi=50)
        print(json.dumps({"fwd": name, "us": round(t * 1e6, 1),
                          "mxu_util": round(flops / t / V5E_BF16_TFLOPS, 3)}))

    # --- backward: dedicated Pallas bwd vs XLA-twin bwd ------------------
    for name, pallas_bwd in (("bwd_dedicated", True), ("bwd_xla_twin", False)):
        f = dispatch._adain_conv_ad(dil, pallas_bwd)

        def loss(x, sc, sh, k1, k2):
            return jnp.sum(f(x, sc, sh, k1, k2).astype(jnp.float32))

        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
        t = metrics_lib.slope_time(g, (x, sc, sh, k1, k2), k_lo=5, k_hi=25)
        # bwd flop budget: 2F data grads + 2F weight grads
        print(json.dumps({"bwd": name, "us": round(t * 1e6, 1),
                          "mxu_util": round(2 * flops / t / V5E_BF16_TFLOPS,
                                            3)}))

    # --- conv transpose re-measure at high iteration count ---------------
    from styletts_zs_tpu.kernels import vocoder_kernels
    from styletts_zs_tpu.ops import conv as conv_ops
    Bt, Tt, Cin, Cout, Kt, r = ((8, 1024, 512, 256, 10, 5) if on_tpu
                                else (2, 64, 16, 8, 10, 5))
    xt = _rand((Bt, Tt, Cin), 0, dtype)
    kt = _rand((Kt, Cin, Cout), 1, dtype, .05)
    fp = jax.jit(lambda x, k: vocoder_kernels.conv_transpose1d_pallas(
        x, k, stride=r))
    fx = jax.jit(lambda x, k: conv_ops.conv_transpose1d(x, k, stride=r))
    ct_flops = 2 * Bt * Tt * Kt * Cin * Cout
    for name, fn in (("convt_pallas", fp), ("convt_xla", fx)):
        t = metrics_lib.slope_time(fn, (xt, kt), k_lo=10, k_hi=100)
        print(json.dumps({"fwd": name, "us": round(t * 1e6, 1),
                          "mxu_util": round(ct_flops / t / V5E_BF16_TFLOPS,
                                            3)}))


if __name__ == "__main__":
    main()
