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
