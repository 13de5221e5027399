"""Isolate super-frame iSTFT cost: bare kernel vs wrapper, block sweep."""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from styletts_zs_tpu.utils import metrics as metrics_lib  # noqa: E402
from styletts_zs_tpu.kernels import vocoder_kernels as VK  # noqa: E402


def main():
    print("backend:", jax.default_backend(), flush=True)
    B, F = 8, 76800
    n_fft, hop, P = 16, 4, 32
    C = 18
    rng = np.random.default_rng(0)
    F_sup = 2432  # multiple of 128
    xs = jnp.asarray(rng.standard_normal((B, F_sup, P * C)), jnp.float32)
    inv_env = jnp.asarray(
        rng.standard_normal((F_sup, P * hop)) ** 2 + 1.0, jnp.float32)
    bytes_min = (B * F_sup * P * C * 4      # xs read
                 + B * F_sup * P * hop * 4)  # out write
    for bt in (16, 64, 128):
        f = jax.jit(lambda x, e, bt=bt: VK._istft_sf_impl(
            x, e, n_fft=n_fft, hop=hop, P=P, block_t=bt))
        out = f(xs, inv_env)
        t = metrics_lib.slope_time_jittered(f, xs, (inv_env,),
                                            k_lo=2, k_hi=20)
        print(f"bare kernel bt={bt}: {t*1e6:.1f}us  "
              f"hbm_util {bytes_min/t/819e9:.3f}", flush=True)

    # wrapper cost = full istft_pallas minus bare kernel
    re = jnp.asarray(rng.standard_normal((B, F, 9)), jnp.float32)
    im = jnp.asarray(rng.standard_normal((B, F, 9)), jnp.float32)
    f_full = jax.jit(lambda r, i: VK.istft_pallas(r, i, n_fft=16, hop=4))
    f_full(re, im)
    t_full = metrics_lib.slope_time_jittered(f_full, re, (im,),
                                             k_lo=2, k_hi=20)
    print(f"full istft_pallas: {t_full*1e6:.1f}us", flush=True)


if __name__ == "__main__":
    main()
