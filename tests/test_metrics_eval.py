"""Metrics writer, timers, and eval-metric unit tests."""
import jax.numpy as jnp
import numpy as np

from styletts_zs_tpu.pipelines import eval as E
from styletts_zs_tpu.utils import metrics as M
from styletts_zs_tpu.utils.config import tiny_test_config


def test_metrics_writer_stdout(capsys):
    w = M.MetricsWriter(None)
    w.scalars(5, {"loss": 1.25}, prefix="train/")
    out = capsys.readouterr().out
    assert '"train/loss": 1.25' in out and '"step": 5' in out
    w.close()


def test_fenced_timer():
    result = {}
    with M.fenced_timer(result) as h:
        h["value"] = jnp.sum(jnp.ones((64, 64)))
    assert result["seconds"] > 0


def test_rtf():
    assert M.rtf(10.0, 1.0) == 10.0


def test_mel_mae_masked():
    a = jnp.ones((1, 4, 3))
    b = jnp.zeros((1, 4, 3))
    mask = jnp.asarray([[True, True, False, False]])
    assert abs(E.mel_mae(a, b, mask) - 1.0) < 1e-6


def test_mel_spectral_distance_zero_for_same():
    cfg = tiny_test_config()
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 2000)).astype(np.float32))
    assert E.mel_spectral_distance(wav, wav, cfg) == 0.0


def test_duration_accuracy_and_f0():
    pred = jnp.asarray([[2, 3, 4]])
    true = jnp.asarray([[2, 3, 5]])
    mask = jnp.asarray([[True, True, True]])
    d = E.duration_accuracy(pred, true, mask)
    assert abs(d["dur_exact_match"] - 2 / 3) < 1e-6
    f0p = jnp.asarray([[0.1, 0.2, 0.0]])
    f0t = jnp.asarray([[0.1, 0.0, 0.3]])
    fm = jnp.asarray([[True, True, True]])
    r = E.f0_rmse(f0p, f0t, fm)
    assert r > 0


def test_slope_time_jittered_sane():
    """Chained jittered timer returns a positive, shape-preserving time."""
    import jax

    x = jnp.ones((64, 64), jnp.float32)
    w = jnp.eye(64, dtype=jnp.float32) * 0.5

    op = jax.jit(lambda x, w: x @ w + 1.0)
    dt = M.slope_time_jittered(op, x, (w,), k_lo=1, k_hi=4)
    assert 0 < dt < 1.0


def test_slope_time_varying_args_monotonic_index():
    """slope_time's args_for sees globally monotonic indices (no replay)."""
    import jax

    seen = []

    def args_for(i):
        seen.append(i)
        return (jnp.float32(i),)

    fn = jax.jit(lambda x: x * 2.0)
    dt = M.slope_time(fn, args_for, k_lo=1, k_hi=3)
    assert dt > 0
    assert seen == sorted(seen) and len(set(seen)) == len(seen)


def _tiny_setup():
    import jax

    from styletts_zs_tpu.pipelines.data import SyntheticDataset
    from styletts_zs_tpu.pipelines.factory import init_params

    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    batch = SyntheticDataset(cfg.model, batch_size=2, seed=5,
                             n_frames=64).next_batch()
    return cfg, params, batch


def test_quality_gate_evaluators_finite():
    """Stage-boundary gates (VERDICT r1 item 8) return finite metric dicts."""
    import jax

    cfg, params, batch = _tiny_setup()
    g = {"acoustic": params["acoustic"], "vocoder": params["vocoder"]}
    rep1 = E.evaluate_acoustic(cfg, g, batch)
    for key in ("mel_mae_teacher_forced", "f0_rmse", "dur_mae_frames"):
        assert np.isfinite(rep1[key]), (key, rep1)

    rng = jax.random.PRNGKey(1)
    rep2 = E.evaluate_diffusion(cfg, params["acoustic"], params["diffusion"],
                                batch, rng, n_steps=2)
    assert np.isfinite(rep2["style_latent_mse_vs_gt"])
    # gt-duration decode: the mel gap must NOT be vacuously zero unless the
    # raw gap is zero too (degenerate-mask regression guard)
    assert (rep2["mel_mae_sampled_vs_gt_style_raw"] > 0
            or rep2["style_latent_mse_vs_gt"] == 0)

    rep3 = E.evaluate_distill_gap(cfg, params["acoustic"],
                                  params["diffusion"], params["diffusion"],
                                  batch, rng, n_teacher_steps=2)
    assert np.isfinite(rep3["distill_latent_mse"])


def test_similarity_margin_falsifiable():
    """The margin metric must be able to FAIL: identical synth/ref tables
    give zero margin and chance-level retrieval; well-separated speaker
    pairs give positive margin and perfect retrieval (VERDICT r2 item 2)."""
    import jax
    cfg, params, batch = _tiny_setup()
    import jax.numpy as jnp
    wavs = jnp.asarray(batch.ref_wav[:, :8000])
    # degenerate case: every synth is the SAME waveform -> margin ~ 0
    same = jnp.broadcast_to(wavs[:1], wavs.shape)
    rep = E.speaker_similarity_margin(cfg, params["acoustic"], same, same)
    assert rep["sim_margin"] < 0.05
    # matched case: synth == its own reference (distinct speakers) ->
    # positive margin, retrieval above chance
    rep2 = E.speaker_similarity_margin(cfg, params["acoustic"], wavs, wavs)
    assert rep2["sim_margin"] > 0.0
    assert rep2["retrieval_acc"] >= rep2["retrieval_chance"]
    for v in rep2.values():
        assert np.isfinite(v)


def test_evaluate_diffusion_multiseed_band():
    """n_seeds > 1 (VERDICT r3 items 3-4): reports the sampler noise band
    and the dispersion ratio; ratio of independent draws from the same
    model is positive and finite."""
    import jax
    cfg, params, batch = _tiny_setup()
    rep = E.evaluate_diffusion(cfg, params["acoustic"], params["diffusion"],
                               batch, jax.random.PRNGKey(3), n_steps=2,
                               n_seeds=3)
    assert rep["style_latent_mse_seeds"] == 3
    assert rep["style_latent_mse_std"] >= 0
    assert np.isfinite(rep["style_mse_ratio_pairs_over_gt"])
    assert rep["style_mse_ratio_pairs_over_gt"] > 0


def test_similarity_margin_rejects_single_pair():
    """ADVICE r3: B=1 has no negatives — must raise, not emit Infinity."""
    import jax.numpy as jnp
    import pytest
    cfg, params, batch = _tiny_setup()
    w = jnp.asarray(batch.ref_wav[:1, :8000])
    with pytest.raises(ValueError):
        E.speaker_similarity_margin(cfg, params["acoustic"], w, w)


def test_fsq_usage_stats_shapes():
    cfg, params, batch = _tiny_setup()
    rep = E.fsq_usage_stats(cfg, params["acoustic"], batch)
    levels = cfg.model.style.fsq_levels
    assert len(rep["fsq_dim_perplexity"]) == len(levels)
    for p, L in zip(rep["fsq_dim_perplexity"], levels):
        assert 1.0 <= p <= L + 1e-6
    assert 0.0 < rep["fsq_unique_frac"] <= 1.0


def test_dispersion_ratio_calibration():
    """Re-derivation of the stage-2 dispersion gate (r5; VERDICT r4 item 4).

    ``style_mse_ratio_pairs_over_gt`` divides mean pairwise E|A-B|^2 between
    independent samples by mean E|A-GT|^2.  The r4 target of 2 assumed GT is
    the conditional MEAN — but the extracted GT style is itself one DRAW
    from the conditional p(style | text, speaker): for a perfect sampler
    both numerator and denominator are 2*sigma^2 and the ratio is 1.  Monte
    Carlo over Gaussians pins the statistic's true calibration:
      perfect sampler (same law as GT)  -> ratio ~ 1
      collapsed sampler (zero spread)   -> ratio ~ 0
      biased sampler (right spread)     -> ratio < 1
    so the r5 gate is ratio within [0.8, 1.3] at guidance 1 (the pure
    conditional); serving guidance shrinks it by CFG design.
    """
    rng = np.random.default_rng(0)
    n, d, sigma = 4096, 64, 0.7
    mu = rng.normal(size=d)

    def ratio(draw_a, draw_b):
        A, B = draw_a(), draw_b()
        GT = mu + sigma * rng.normal(size=(n, d))
        pairs = np.mean((A - B) ** 2)
        to_gt = 0.5 * (np.mean((A - GT) ** 2) + np.mean((B - GT) ** 2))
        return pairs / to_gt

    gauss = lambda: mu + sigma * rng.normal(size=(n, d))
    r_perfect = ratio(gauss, gauss)
    assert abs(r_perfect - 1.0) < 0.05, r_perfect
    r_collapsed = ratio(lambda: np.tile(mu, (n, 1)),
                        lambda: np.tile(mu, (n, 1)))
    assert r_collapsed < 0.05, r_collapsed
    biased = lambda: (mu + 1.0) + sigma * rng.normal(size=(n, d))
    r_biased = ratio(biased, biased)
    assert r_biased < 0.8, r_biased
