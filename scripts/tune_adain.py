"""AdaIN-conv kernel tuning sweep on the real chip (VERDICT r1 item 4/5).

Measures forward variants of the fused AdaIN->SiLU->conv block and the
dedicated backward vs the XLA twin, at prod shapes.  Timing is CHAINED
slope-method (``metrics.slope_time_chained``): dispatch i consumes dispatch
i-1's output — identical repeated dispatches get coalesced by the remote
runtime and fake a ~0 slope (observed 1.9 us for a 43-GFLOP kernel).

Dead end (documented): a concat-taps variant that fused the K shifted tap
slices into ONE (bt, K*C) @ (K*C, C) matmul does NOT compile — Mosaic
rejects concatenation of sublane-offset slices ("result/input offset
mismatch on non-concat dimension").  The per-tap accumulation loop with
misaligned dot inputs compiles fine.

Run (TPU, one process at a time!):  python scripts/tune_adain.py
"""
from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from styletts_zs_tpu.kernels import decoder_kernels as DK          # noqa: E402
from styletts_zs_tpu.kernels import dispatch                        # noqa: E402
from styletts_zs_tpu.utils import metrics as metrics_lib            # noqa: E402

V5E_BF16_TFLOPS = 197e12  # v5e bf16 peak (394 is the int8 number)


def _rand(shape, seed=0, dtype=jnp.bfloat16, scale=1.0):
    x = np.random.default_rng(seed).standard_normal(shape) * scale
    return jnp.asarray(x.astype(np.float32)).astype(dtype)


def block_v0(x, scale, shift, k1, k2, *, dilation, block_t):
    C = x.shape[-1]
    h, _, _ = DK._mod_conv_pass(x, scale[..., :C], shift[..., :C], k1,
                                dilation=dilation, block_t=block_t)
    h2, _, _ = DK._mod_conv_pass(h, scale[..., C:], shift[..., C:], k2,
                                 dilation=1, block_t=block_t)
    return ((x.astype(jnp.float32) + h2.astype(jnp.float32))
            * np.float32(1.0 / np.sqrt(2.0))).astype(x.dtype)


def main():
    print(json.dumps({"backend": jax.default_backend()}), flush=True)
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    B, T, C, K, dil = (8, 1024, 512, 5, 3) if on_tpu else (2, 128, 32, 5, 3)
    x = _rand((B, T, C), 0, dtype)
    sc = _rand((B, T, 2 * C), 1, dtype, .2)
    sh = _rand((B, T, 2 * C), 2, dtype, .2)
    k1 = _rand((K, C, C), 3, dtype, .05)
    k2 = _rand((K, C, C), 4, dtype, .05)
    flops = 2 * B * T * K * C * C * 2
    klo, khi = (5, 40) if on_tpu else (1, 3)

    def timed(op, x0, static, k_lo, k_hi):
        # shared coalescing/DCE-proof timer (fp32 carry, sum-coupled
        # outputs) — do NOT inline a copy here; it drifted once already
        # (single-element coupling let XLA DCE the op under test)
        return metrics_lib.slope_time_jittered(op, x0, static,
                                               k_lo=k_lo, k_hi=k_hi)

    variants = {
        "xla_twin": (lambda x, *a: dispatch.adain_conv_block(
            x, *a, dilation=dil, use_pallas=False)),
        "v0_bt512": (lambda x, *a: block_v0(x, *a, dilation=dil,
                                            block_t=512)),
        "v0_bt256": (lambda x, *a: block_v0(x, *a, dilation=dil,
                                            block_t=256)),
        "v0_bt128": (lambda x, *a: block_v0(x, *a, dilation=dil,
                                            block_t=128)),
        "v0_bt64": (lambda x, *a: block_v0(x, *a, dilation=dil,
                                           block_t=64)),
    }
    ref = None
    for name, op in variants.items():
        try:
            out = jax.jit(op)(x, sc, sh, k1, k2)
            if ref is None:
                ref = np.asarray(out, np.float32)
            else:
                err = float(np.abs(np.asarray(out, np.float32) - ref).max())
                assert err < 0.1, f"{name} mismatch {err}"
            t = timed(op, x, (sc, sh, k1, k2), klo, khi)
            print(json.dumps({"fwd": name, "us": round(t * 1e6, 1),
                              "mxu_util": round(flops / t / V5E_BF16_TFLOPS,
                                                3)}), flush=True)
        except Exception as e:
            print(json.dumps({"fwd": name, "error": repr(e)[:200]}),
                  flush=True)

    # --- backward: dedicated Pallas bwd vs XLA-twin bwd -------------------
    for name, pallas_bwd in (("bwd_dedicated", True), ("bwd_xla_twin", False)):
        f = dispatch._adain_conv_ad(dil, pallas_bwd)

        def loss(x, sc, sh, k1, k2):
            return jnp.sum(f(x, sc, sh, k1, k2).astype(jnp.float32))

        g = jax.grad(loss, argnums=(0, 1, 2, 3, 4))

        def gx(x, *a):
            return g(x, *a)[0].astype(x.dtype)

        t = timed(gx, x, (sc, sh, k1, k2), max(2, klo // 2),
                  max(4, khi // 2))
        print(json.dumps({"bwd": name, "us": round(t * 1e6, 1),
                          "mxu_util": round(2 * flops / t / V5E_BF16_TFLOPS,
                                            3)}), flush=True)

    # --- conv transpose, chained through the weights ----------------------
    from styletts_zs_tpu.kernels import vocoder_kernels
    from styletts_zs_tpu.ops import conv as conv_ops
    Bt, Tt, Cin, Cout, Kt, r = ((8, 1024, 512, 256, 10, 5) if on_tpu
                                else (2, 64, 16, 8, 10, 5))
    xt = _rand((Bt, Tt, Cin), 0, dtype)
    kt = _rand((Kt, Cin, Cout), 1, dtype, .05)
    ct_flops = 2 * Bt * Tt * Kt * Cin * Cout

    for name, op in (
            ("convt_pallas", lambda k, x: vocoder_kernels
             .conv_transpose1d_pallas(x, k, stride=r)),
            ("convt_xla", lambda k, x: conv_ops.conv_transpose1d(
                x, k, stride=r))):
        def op_k(k, x, _op=op):
            out = _op(k, x)
            # couple the (shape-mismatched) output back into the carry
            return jnp.zeros_like(k) + (out.reshape(-1)[0]
                                        * jnp.asarray(1e-30, jnp.float32)
                                        ).astype(k.dtype) + k
        t = timed(lambda k, x: op_k(k, x), kt, (xt,), klo, khi)
        print(json.dumps({"fwd": name, "us": round(t * 1e6, 1),
                          "mxu_util": round(ct_flops / t / V5E_BF16_TFLOPS,
                                            3)}), flush=True)


if __name__ == "__main__":
    main()
