"""Per-kernel microbenchmarks: Pallas vs XLA twin on the real chip.

Substantiates the "speed-of-light per chip" obligation (``BASELINE.json:5``)
with measured per-kernel times and a roofline estimate against v5e peak
(~394 bf16 TFLOP/s MXU, ~819 GB/s HBM — SURVEY.md §5.1).

Run:  python scripts/kernel_bench.py            (one JSON line per kernel)
"""
from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

V5E_BF16_TFLOPS = 394e12
V5E_HBM_BPS = 819e9


def _rand(shape, seed=0, dtype=jnp.float32, scale=1.0):
    x = np.random.default_rng(seed).standard_normal(shape) * scale
    return jnp.asarray(x.astype(np.float32)).astype(dtype)


@jax.jit
def _reduce(x):
    return jnp.sum(x.astype(jnp.float32))


def _run_k(fn, args, k):
    t0 = time.perf_counter()
    out = None
    for _ in range(k):
        out = fn(*args)
    _ = float(_reduce(out))  # forces completion (block_until_ready is a
    return time.perf_counter() - t0  # no-op under the remote runtime)


def timeit(fn, *args, iters=20):
    """Per-call time as the slope of wall time vs dispatched iterations."""
    out = fn(*args)
    _ = float(_reduce(out))  # warm both programs
    k_lo, k_hi = max(2, iters // 10), iters
    t_lo = _run_k(fn, args, k_lo)
    t_hi = _run_k(fn, args, k_hi)
    return max((t_hi - t_lo) / (k_hi - k_lo), 1e-9)


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
    report("adain_conv_block", tp, tx, flops)


def bench_conv_transpose(dtype=jnp.bfloat16):
    from styletts_zs_tpu.kernels import vocoder_kernels
    from styletts_zs_tpu.ops import conv as conv_ops
    B, T, Cin, Cout, K, r = 8, 1024, 512, 256, 10, 5
    x = _rand((B, T, Cin), 0, dtype)
    k = _rand((K, Cin, Cout), 1, dtype, .05)
    f_p = jax.jit(lambda x, k: vocoder_kernels.conv_transpose1d_pallas(
        x, k, stride=r))
    f_x = jax.jit(lambda x, k: conv_ops.conv_transpose1d(x, k, stride=r))
    tp = timeit(f_p, x, k)
    tx = timeit(f_x, x, k)
    flops = 2 * B * T * K * Cin * Cout
    report("vocoder_conv_transpose", tp, tx, flops)


def bench_istft():
    from styletts_zs_tpu.kernels import vocoder_kernels
    from styletts_zs_tpu.ops import stft as stft_ops
    from styletts_zs_tpu.utils.config import AudioConfig
    B, F = 8, 76800  # 1024 mel frames * 75 upsample
    re = _rand((B, F, 9), 0)
    im = _rand((B, F, 9), 1)
    cfg = AudioConfig(n_fft=16, win_length=16, hop_length=4)
    f_p = jax.jit(lambda r, i: vocoder_kernels.istft_pallas(
        r, i, n_fft=16, hop=4))
    f_x = jax.jit(lambda r, i: stft_ops.istft(r, i, cfg))
    tp = timeit(f_p, re, im, iters=5)
    tx = timeit(f_x, re, im, iters=5)
    bytes_moved = B * F * (18 * 4 + 4 * 4)
    report("istft_overlap_add", tp, tx, None, bytes_moved)


if __name__ == "__main__":
    print(json.dumps({"backend": jax.default_backend(),
                      "device": str(jax.devices()[0])}))
    bench_local_attention()
    bench_adain_conv()
    bench_conv_transpose()
    bench_istft()
