"""Per-kernel microbenchmarks: Pallas vs XLA twin on the real chip.

Substantiates the "speed-of-light per chip" obligation (``BASELINE.json:5``)
with measured per-kernel times and roofline estimates against v5e peak
(~197 bf16 TFLOP/s MXU, ~819 GB/s HBM; SURVEY.md §5.1 said 394 — that is the int8 peak) for ALL five
mandated kernel families (attention fwd+bwd, AdaIN-conv fwd+bwd, transposed
conv, iSTFT head, fused sampler tail).

Timing: ``styletts_zs_tpu.utils.metrics.slope_time_jittered`` (chained
slope method with a never-repeating carry; the runtime's block_until_ready
is a no-op AND it coalesces dispatches whose input values repeat, so plain
repeated-args timing under-reports — CLAUDE.md timing rules).

Run:  python scripts/kernel_bench.py            (one JSON line per kernel)
"""
from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from styletts_zs_tpu.utils import metrics as metrics_lib  # noqa: E402

V5E_BF16_TFLOPS = 197e12  # v5e bf16 peak (394 is the int8 number)
V5E_HBM_BPS = 819e9


def _rand(shape, seed=0, dtype=jnp.float32, scale=1.0):
    x = np.random.default_rng(seed).standard_normal(shape) * scale
    return jnp.asarray(x.astype(np.float32)).astype(dtype)


def timeit(fn, *args, iters=50):
    """Chained timing: first arg is the carry, the rest are static."""
    return metrics_lib.slope_time_jittered(
        fn, args[0], args[1:], k_lo=max(2, iters // 10), k_hi=iters)


def report(name, t_pallas, t_xla, flops=None, bytes_moved=None):
    rec = {"kernel": name, "pallas_us": round(t_pallas * 1e6, 1),
           "xla_us": round(t_xla * 1e6, 1),
           "speedup": round(t_xla / t_pallas, 2)}
    if flops:
        rec["pallas_tflops"] = round(flops / t_pallas / 1e12, 2)
        rec["mxu_util"] = round(flops / t_pallas / V5E_BF16_TFLOPS, 3)
    if bytes_moved:
        rec["hbm_gbps"] = round(bytes_moved / t_pallas / 1e9, 1)
        rec["hbm_util"] = round(bytes_moved / t_pallas / V5E_HBM_BPS, 3)
    print(json.dumps(rec))
    return rec


def bench_local_attention(dtype=jnp.bfloat16):
    from styletts_zs_tpu.kernels import attention_kernel
    from styletts_zs_tpu.ops import attention as attn_ops
    B, T, H, D, chunk = 8, 4864, 8, 64, 256
    q, k, v = (_rand((B, T, H, D), s, dtype) for s in range(3))
    f_p = jax.jit(lambda q, k, v: attention_kernel.local_attention_pallas(
        q, k, v, chunk=chunk))
    f_x = jax.jit(lambda q, k, v: attn_ops.local_attention(
        q, k, v, chunk=chunk))
    tp = timeit(f_p, q, k, v)
    tx = timeit(f_x, q, k, v)
    flops = 2 * 2 * B * H * T * 3 * chunk * D  # qk + pv
    bytes_moved = 4 * B * T * H * D * (2 if dtype == jnp.bfloat16 else 4)
    report("local_attention_60s", tp, tx, flops, bytes_moved)


def bench_local_attention_bwd(dtype=jnp.bfloat16):
    """Flash-style dedicated bwd kernels vs differentiated XLA twin."""
    from styletts_zs_tpu.kernels import dispatch
    from styletts_zs_tpu.ops import attention as attn_ops
    B, T, H, D, chunk = 8, 4864, 8, 64, 256
    q, k, v = (_rand((B, T, H, D), s, dtype) for s in range(3))

    def loss_p(q, k, v):
        return jnp.sum(dispatch.local_attention(
            q, k, v, chunk=chunk, use_pallas=True).astype(jnp.float32))

    def loss_x(q, k, v):
        return jnp.sum(attn_ops.local_attention(
            q, k, v, chunk=chunk).astype(jnp.float32))

    g_p = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2)))
    g_x = jax.jit(jax.grad(loss_x, argnums=(0, 1, 2)))
    tp = timeit(g_p, q, k, v, iters=20)
    tx = timeit(g_x, q, k, v, iters=20)
    # bwd ~ 2.5x fwd matmul work (dq, dk, dv, p recompute)
    flops = 5 * 2 * B * H * T * 3 * chunk * D
    report("local_attention_bwd", tp, tx, flops)


def bench_adain_conv(dtype=jnp.bfloat16):
    from styletts_zs_tpu.kernels import decoder_kernels, dispatch
    B, T, C, K = 8, 1024, 512, 5
    x = _rand((B, T, C), 0, dtype)
    sc = _rand((B, T, 2 * C), 1, dtype, .2)
    sh = _rand((B, T, 2 * C), 2, dtype, .2)
    k1 = _rand((K, C, C), 3, dtype, .05)
    k2 = _rand((K, C, C), 4, dtype, .05)
    f_p = jax.jit(lambda *a: decoder_kernels.adain_conv_block_pallas(
        *a, dilation=3))
    f_x = jax.jit(lambda *a: dispatch.adain_conv_block(
        *a, dilation=3, use_pallas=False))
    tp = timeit(f_p, x, sc, sh, k1, k2)
    tx = timeit(f_x, x, sc, sh, k1, k2)
    flops = 2 * B * T * K * C * C * 2
    bytes_moved = (B * T * C * 10) * (2 if dtype == jnp.bfloat16 else 4)
    report("adain_conv_block", tp, tx, flops, bytes_moved)

    # production route (XLA fwd + dedicated Pallas saved-stats backward)
    # vs straight autodiff of the XLA twin
    import functools as _ft

    def mk(f):
        def loss(x, sc, sh, k1, k2):
            return jnp.sum(f(x, sc, sh, k1, k2).astype(jnp.float32))
        return jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))

    tp = timeit(mk(dispatch._adain_conv_ad(3, True)), x, sc, sh, k1, k2,
                iters=20)
    tx = timeit(mk(_ft.partial(dispatch._adain_conv_xla, dilation=3)),
                x, sc, sh, k1, k2, iters=20)
    report("adain_conv_fwd_plus_bwd", tp, tx, 3 * flops)


def bench_conv_transpose(dtype=jnp.bfloat16):
    from styletts_zs_tpu.kernels import vocoder_kernels
    from styletts_zs_tpu.ops import conv as conv_ops
    B, T, Cin, Cout, K, r = 8, 1024, 512, 256, 10, 5
    x = _rand((B, T, Cin), 0, dtype)
    k = _rand((K, Cin, Cout), 1, dtype, .05)
    f_p = jax.jit(lambda x, k: vocoder_kernels.conv_transpose1d_pallas(
        x, k, stride=r))
    f_x = jax.jit(lambda x, k: conv_ops.conv_transpose1d(x, k, stride=r))
    tp = timeit(f_p, x, k, iters=100)
    tx = timeit(f_x, x, k, iters=100)
    flops = 2 * B * T * K * Cin * Cout
    report("vocoder_conv_transpose", tp, tx, flops)


def bench_istft():
    """iSTFT head measured through the mag/phase epilogue, as prod runs it.

    Standalone (B, F, 9) real/imag arguments are NOT prod-realistic: XLA
    lane-pads the 9-wide minor dim to 128 in HBM (14x inflation), so a
    standalone comparison mostly times that relayout.  In the fused program
    the head conv's epilogue (exp/rsqrt + packing) fuses into one pass, so
    both paths here consume the same (B, F, 27) head tensor through the
    identical epilogue (the composition now lives in
    kernels/dispatch.py::_synthesis_head_xla; prod fuses the whole tail —
    see bench_synthesis_head).
    """
    from styletts_zs_tpu.kernels import vocoder_kernels
    from styletts_zs_tpu.ops import stft as stft_ops
    from styletts_zs_tpu.utils.config import AudioConfig
    B, F = 8, 76800  # 1024 mel frames * 75 upsample
    head = _rand((B, F, 27), 0)
    cfg = AudioConfig(n_fft=16, win_length=16, hop_length=4)

    def epilogue(head):
        logmag, pc, ps = jnp.split(head, 3, axis=-1)
        mag = jnp.exp(jnp.clip(logmag.astype(jnp.float32), -12.0, 6.0))
        norm = jax.lax.rsqrt(pc.astype(jnp.float32) ** 2
                             + ps.astype(jnp.float32) ** 2 + 1e-7)
        return mag * pc * norm, mag * ps * norm

    def f_p(head):
        return vocoder_kernels.istft_pallas(*epilogue(head), n_fft=16, hop=4)

    def f_x(head):
        return stft_ops.istft(*epilogue(head), cfg)

    tp = timeit(jax.jit(f_p), head, iters=20)
    tx = timeit(jax.jit(f_x), head, iters=20)
    bytes_moved = B * F * (27 * 4 + 4 * 4)
    report("istft_overlap_add", tp, tx, None, bytes_moved)


def bench_full_attention(dtype=jnp.bfloat16):
    """Diffusion/decoder full attention (CFG-doubled batch, style codes)."""
    from styletts_zs_tpu.kernels import attention_kernel
    from styletts_zs_tpu.ops import attention as attn_ops
    B, Tq, Tk, H, D = 64, 128, 256, 8, 64  # doubled batch 2x32, codes->text
    q = _rand((B, Tq, H, D), 0, dtype)
    k = _rand((B, Tk, H, D), 1, dtype)
    v = _rand((B, Tk, H, D), 2, dtype)
    f_p = jax.jit(lambda q, k, v: attention_kernel.full_attention_pallas(
        q, k, v))
    f_x = jax.jit(lambda q, k, v: attn_ops.cross_attention(q, k, v))
    tp = timeit(f_p, q, k, v, iters=100)
    tx = timeit(f_x, q, k, v, iters=100)
    flops = 2 * 2 * B * H * Tq * Tk * D
    bytes_moved = (B * (Tq * 2 + Tk * 2) * H * D
                   * (2 if dtype == jnp.bfloat16 else 4))
    report("full_attention_cfg", tp, tx, flops, bytes_moved)


def bench_sampler_tail():
    """Fused CFG + Euler ODE update (VPU pass; bandwidth-bound)."""
    from styletts_zs_tpu.kernels import sampler_kernel
    B, K, D = 32, 50, 128
    x = _rand((B, K, D), 0)
    dc = _rand((B, K, D), 1)
    du = _rand((B, K, D), 2)
    s_cur = jnp.float32(1.0)
    s_next = jnp.float32(0.5)
    f_p = jax.jit(lambda x, dc, du: sampler_kernel.fused_euler_step(
        x, dc, du, s_cur, s_next, guidance=2.0))

    def xla_twin(x, dc, du):
        xf, dcf, duf = (a.astype(jnp.float32) for a in (x, dc, du))
        den = duf + 2.0 * (dcf - duf)
        d = (xf - den) / s_cur
        return xf + (s_next - s_cur) * d, d

    f_x = jax.jit(xla_twin)
    tp = timeit(f_p, x, dc, du, iters=200)
    tx = timeit(f_x, x, dc, du, iters=200)
    bytes_moved = B * K * D * 5 * 4  # 3 reads + 2 writes fp32
    report("sampler_cfg_euler_tail", tp, tx, None, bytes_moved)


def bench_synthesis_head(dtype=jnp.bfloat16):
    """Fused synthesis head (leaky+conv7+epilogue+OLA) vs unfused twin at
    prod shapes: (B, 25600, 128) MRF output, n_fft 48 / hop 12."""
    from styletts_zs_tpu.kernels import dispatch, vocoder_kernels
    B, T, C, n_fft, hop = 8, 25600, 128, 48, 12
    n_freq = n_fft // 2 + 1
    x = _rand((B, T, C), 0, dtype, 0.7)
    w = _rand((7, C, 3 * n_freq), 1, jnp.float32, 0.05)
    b = _rand((3 * n_freq,), 2, jnp.float32, 0.1)
    f_p = jax.jit(lambda x: vocoder_kernels.synthesis_head_pallas(
        x, w, b, n_fft=n_fft, hop=hop))
    f_x = jax.jit(lambda x: dispatch._synthesis_head_xla(
        x, w, b, n_fft=n_fft, hop=hop))
    tp = timeit(f_p, x, iters=24)
    tx = timeit(f_x, x, iters=24)
    flops = B * T * (2 * 7 * C * 3 * n_freq          # head conv
                     + 2 * hop * 2 * 2 * n_freq)     # OLA matmul pair
    bytes_moved = B * T * C * 2 + B * (T - 1) * hop * 4
    report("synthesis_head_fused", tp, tx, flops, bytes_moved)


if __name__ == "__main__":
    print(json.dumps({"backend": jax.default_backend(),
                      "device": str(jax.devices()[0])}))
    bench_local_attention()
    bench_local_attention_bwd()
    bench_adain_conv()
    bench_conv_transpose()
    bench_istft()
    bench_synthesis_head()
    bench_full_attention()
    bench_sampler_tail()
