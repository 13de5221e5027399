"""Vocoder-stage probe: current MRF vs grouped-conv MRF at bench shapes.

The batch-32 synthesis trace (docs/artifacts/profile_synthesis_r2.json)
puts ~56 ms of the 71.6 ms call in convolution fusions, roughly half in the
vocoder's 5x/25x frame-rate resblock stacks, plus ~10 ms of waveform-rate
elementwise passes (leaky_relu compare/selects, residual adds) that XLA
cannot fuse into the convs because pre-activations have two consumers.

Variant under test: fold the MRF's three parallel resblock branches
(kernel sizes 3/7/11) into ONE grouped conv per dilation step —
feature_group_count=3 on a (B, T, 3C) tensor, kernels zero-padded to 11
taps.  3x fewer conv ops and elementwise passes per stage at 1.57x the
(underutilized, 21%-MXU) FLOPs.

Timing: slope method with a varying input per dispatch (CLAUDE.md rule 3).
"""
from __future__ import annotations

import json
import sys

import flax.linen as nn
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from styletts_zs_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from styletts_zs_tpu.models.vocoder import Vocoder  # noqa: E402
from styletts_zs_tpu.utils import metrics as M  # noqa: E402
from styletts_zs_tpu.utils.config import VocoderConfig  # noqa: E402


class GroupedMRFVocoder(nn.Module):
    """Vocoder variant: MRF branches fused via grouped convs (probe only)."""

    cfg: VocoderConfig
    n_mels: int = 80
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, mel):
        c = self.cfg
        n_br = len(c.resblock_kernels)
        kmax = max(c.resblock_kernels)
        x = nn.Conv(c.dims[0], (7,), dtype=self.dtype, name="conv_in")(mel)
        for i, (rate, kern) in enumerate(zip(c.upsample_rates,
                                             c.upsample_kernels)):
            dim = c.dims[i + 1]
            x = jax.nn.leaky_relu(x, 0.1)
            k = self.param(f"up{i}_kernel", nn.initializers.lecun_normal(),
                           (kern, c.dims[i], dim), jnp.float32)
            x = jax.lax.conv_transpose(
                x, k.astype(self.dtype), strides=(rate,), padding="SAME",
                dimension_numbers=("NHC", "HIO", "NHC"))
            # grouped MRF: (B, T, n_br*dim), each group one branch
            h = jnp.tile(x, (1, 1, n_br))
            for di, d in enumerate(c.resblock_dilations):
                a = jax.nn.leaky_relu(h, 0.1)
                a = nn.Conv(n_br * dim, (kmax,), kernel_dilation=(d,),
                            feature_group_count=n_br, dtype=self.dtype,
                            name=f"mrf{i}_{di}a")(a)
                a = jax.nn.leaky_relu(a, 0.1)
                a = nn.Conv(n_br * dim, (kmax,), feature_group_count=n_br,
                            dtype=self.dtype, name=f"mrf{i}_{di}b")(a)
                h = h + a
            x = jnp.mean(h.reshape(*h.shape[:2], n_br, dim), axis=2)
        x = jax.nn.leaky_relu(x, 0.1)
        n_freq = c.istft_n_fft // 2 + 1
        head = nn.Conv(3 * n_freq, (7,), dtype=self.dtype,
                       name="istft_head")(x)
        logmag, pc, ps = jnp.split(head, 3, axis=-1)
        mag = jnp.exp(jnp.clip(logmag.astype(jnp.float32), -12.0, 6.0))
        norm = jax.lax.rsqrt(pc.astype(jnp.float32) ** 2
                             + ps.astype(jnp.float32) ** 2 + 1e-7)
        from styletts_zs_tpu.kernels import dispatch
        wav = dispatch.istft_head(mag * pc.astype(jnp.float32) * norm,
                                  mag * ps.astype(jnp.float32) * norm,
                                  n_fft=c.istft_n_fft, hop=c.istft_hop,
                                  use_pallas=True)
        return wav


def time_model(model, params, B, T, n_mels, k_lo=2, k_hi=12):
    fn = jax.jit(lambda p, m: model.apply(p, m))

    def args_for(i):
        key = jax.random.PRNGKey(i)
        return (params, jax.random.normal(key, (B, T, n_mels)) * 0.5)

    fn(*args_for(0))
    return M.slope_time(fn, args_for, k_lo=k_lo, k_hi=k_hi)


def main():
    print("backend:", jax.default_backend(), flush=True)
    B, T, n_mels = 32, 1024, 80
    cfg = VocoderConfig()
    rng = jax.random.PRNGKey(0)
    mel0 = jnp.zeros((2, 16, n_mels))

    base = Vocoder(cfg, n_mels=n_mels, use_pallas=True, dtype=jnp.bfloat16)
    p_base = base.init(rng, mel0)
    dt_b = time_model(base, p_base, B, T, n_mels)
    print(json.dumps({"variant": "current", "ms": round(dt_b * 1e3, 3)}),
          flush=True)

    grp = GroupedMRFVocoder(cfg, n_mels=n_mels)
    p_grp = grp.init(rng, mel0)
    dt_g = time_model(grp, p_grp, B, T, n_mels)
    print(json.dumps({"variant": "grouped_mrf", "ms": round(dt_g * 1e3, 3)}),
          flush=True)
    print(json.dumps({"speedup_grouped": round(dt_b / dt_g, 3)}), flush=True)


if __name__ == "__main__":
    main()
