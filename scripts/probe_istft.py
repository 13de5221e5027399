"""On-chip probe: super-frame iSTFT Pallas kernel vs XLA twin.

Numerics gate first (Mosaic is NOT covered by the interpret-mode tests),
then chained slope timing (CLAUDE.md timing rules).
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from styletts_zs_tpu.utils import metrics as metrics_lib  # noqa: E402
from styletts_zs_tpu.kernels import vocoder_kernels as VK  # noqa: E402
from styletts_zs_tpu.ops import stft as stft_ops  # noqa: E402
from styletts_zs_tpu.utils.config import AudioConfig  # noqa: E402


def main():
    print("backend:", jax.default_backend(), flush=True)
    B, F = 8, 76800  # 1024 mel frames * 75 upsample, batch 8
    rng = np.random.default_rng(0)
    re = jnp.asarray(rng.standard_normal((B, F, 9)), jnp.float32)
    im = jnp.asarray(rng.standard_normal((B, F, 9)), jnp.float32)
    cfg = AudioConfig(n_fft=16, win_length=16, hop_length=4)
    f_x = jax.jit(lambda r, i: stft_ops.istft(r, i, cfg))
    b = np.asarray(f_x(re, im))
    bytes_moved = B * F * (18 * 4 + 4 * 4)
    tx = metrics_lib.slope_time_jittered(f_x, re, (im,), k_lo=2, k_hi=20)
    print(f"xla twin {tx*1e6:.1f}us", flush=True)
    for prec in (None, jax.lax.Precision.HIGHEST):
        f_p = jax.jit(lambda r, i, prec=prec: VK.istft_pallas(
            r, i, n_fft=16, hop=4, precision=prec))
        a = np.asarray(f_p(re, im))
        err = float(np.max(np.abs(a - b[:, : a.shape[1]])))
        tp = metrics_lib.slope_time_jittered(f_p, re, (im,), k_lo=2, k_hi=20)
        print(f"precision={prec}: err {err:.2e}  pallas {tp*1e6:.1f}us  "
              f"speedup {tx/tp:.2f}x  hbm_util {bytes_moved/tp/819e9:.3f}",
              flush=True)


if __name__ == "__main__":
    main()
