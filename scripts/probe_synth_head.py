"""Probe: fused synthesis-head kernel vs the unfused XLA composition on TPU.

Measures the vocoder tail (leaky_relu + K=7 head conv + mag/phase epilogue +
iSTFT overlap-add) both ways at bench shapes with the chained slope timer
(CLAUDE.md timing rules: block_until_ready is a no-op and the runtime
memoizes repeated input values, so the carry must never repeat).

    python scripts/probe_synth_head.py [--batch 32] [--frames 25600]
"""
from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--frames", type=int, default=25600)
    ap.add_argument("--channels", type=int, default=128)
    ap.add_argument("--n-fft", type=int, default=48)
    ap.add_argument("--hop", type=int, default=12)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from styletts_zs_tpu.kernels import dispatch, vocoder_kernels
    from styletts_zs_tpu.utils import metrics as metrics_lib
    from styletts_zs_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    dt = jnp.dtype(args.dtype)
    B, T, C = args.batch, args.frames, args.channels
    n_freq = args.n_fft // 2 + 1
    rng = jax.random.PRNGKey(0)
    x = (jax.random.normal(rng, (B, T, C)) * 0.5).astype(dt)
    w = (jax.random.normal(rng, (7, C, 3 * n_freq)) * 0.05).astype(jnp.float32)
    b = (jax.random.normal(rng, (3 * n_freq,)) * 0.1).astype(jnp.float32)

    fns = {
        f"fused_pallas_bt{bt}": jax.jit(
            lambda x, bt=bt: vocoder_kernels.synthesis_head_pallas(
                x, w, b, n_fft=args.n_fft, hop=args.hop, block_t=bt))
        for bt in (32, 64, 128, 256)
    }
    fns["xla_twin"] = jax.jit(lambda x: dispatch._synthesis_head_xla(
        x, w, b, n_fft=args.n_fft, hop=args.hop))
    out = {k: f(x) for k, f in fns.items()}
    err = max(float(jnp.abs(v.astype(jnp.float32)
                            - out["xla_twin"].astype(jnp.float32)).max())
              for k, v in out.items() if k != "xla_twin")
    print(f"shapes: x {x.shape} {dt}, wav {out['xla_twin'].shape}; "
          f"maxdiff {err:.3e}")

    x0f = x.astype(jnp.float32)
    for name, f in fns.items():
        # jittered never-repeating carry, with x0 as a runtime arg (a
        # closure-captured 400 MB constant blows the remote-compile body)
        @jax.jit
        def step(carry, x0f, f=f):
            xc, i = carry
            y = f(xc.astype(dt))
            total = jnp.sum(y.astype(jnp.float32))
            j = ((i * 48271) % 2048).astype(jnp.float32) / 2048.0
            return (x0f * (0.999 + 0.002 * j) + total * jnp.float32(1e-30),
                    i + 1)

        t = metrics_lib.slope_time_chained(step, (x0f, jnp.int32(0)),
                                           (x0f,), k_lo=4, k_hi=24)
        gb = (x.size * x.dtype.itemsize
              + out[name].size * out[name].dtype.itemsize) / 1e9
        print(f"{name}: {t*1e3:.3f} ms/call "
              f"({gb/t:.0f} GB/s of 819 GB/s HBM floor)")


if __name__ == "__main__":
    main()
