"""In-program sampler-tail decision: full multi-step sampler, Pallas tail
vs XLA tail.

The standalone tail micro-benchmark is dispatch-noise-dominated (the op
moves ~4 MB, a ~5 us HBM-floor pass, while the RPC dispatch floor is
~100 us; three repeats measured 1.29x / 0.71x / 0.61x).  The real question
is whether the Pallas call's fusion boundary inside the scan costs more
than it saves — so measure the whole ``StyleDiffusion.sample`` program
both ways at the level-3 acceptance shape (B32, 16 Heun steps).
"""
from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from styletts_zs_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from styletts_zs_tpu.models.diffusion import StyleDiffusion  # noqa: E402
from styletts_zs_tpu.utils import metrics as metrics_lib  # noqa: E402
from styletts_zs_tpu.utils.config import Config, ModelConfig, RuntimeConfig  # noqa: E402


def main():
    print("backend:", jax.default_backend(), flush=True)
    cfg = Config(model=ModelConfig(max_text_len=256, max_frames=1024),
                 runtime=RuntimeConfig(compute_dtype="bfloat16",
                                       use_pallas=True))
    m = cfg.model
    B, Tt = 32, m.max_text_len
    rng = jax.random.PRNGKey(0)
    text_enc = jax.random.normal(rng, (B, Tt, m.text_encoder.dim),
                                 jnp.bfloat16)
    tokens = jax.random.normal(rng, (B, 16, m.text_encoder.dim),
                               jnp.bfloat16)
    summary = jax.random.normal(rng, (B, m.text_encoder.dim), jnp.bfloat16)

    for use_pallas in (True, False):
        model = StyleDiffusion(m.diffusion, m.style,
                               ctx_dim=m.text_encoder.dim,
                               dtype=jnp.bfloat16, use_pallas=use_pallas)
        params = model.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, m.style.n_codes, m.style.d_style)),
                            text_enc[:1], tokens[:1], summary[:1],
                            jax.random.PRNGKey(2),
                            method=StyleDiffusion.init_all)

        def fn(key):
            return model.apply(params, key, text_enc, tokens, summary,
                               n_steps=16, method=StyleDiffusion.sample)

        fnj = jax.jit(fn)
        fnj(jax.random.PRNGKey(0))
        dt = metrics_lib.slope_time(
            fnj, lambda i: (jax.random.PRNGKey(i),), k_lo=2, k_hi=10)
        print(f"use_pallas_tail={use_pallas}: {dt*1e3:.2f} ms/call",
              flush=True)

        # distillation speed-reduction claim (reference README.md:5: "90%"):
        # the same network, one CFG-doubled call at sigma_max
        def fn1(key):
            return model.apply(params, key, text_enc, tokens, summary,
                               method=StyleDiffusion.sample_onestep)

        fn1j = jax.jit(fn1)
        fn1j(jax.random.PRNGKey(0))
        dt1 = metrics_lib.slope_time(
            fn1j, lambda i: (jax.random.PRNGKey(i),), k_lo=2, k_hi=10)
        print(f"  one-step distilled sampler: {dt1*1e3:.2f} ms/call "
              f"(reduction {100*(1-dt1/dt):.1f}% vs 16-step)", flush=True)


if __name__ == "__main__":
    main()
