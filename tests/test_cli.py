"""CLI end-to-end smoke tests (subprocess, tiny config)."""
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = {**os.environ, "PALLAS_AXON_POOL_IPS": "", "JAX_PLATFORMS": "cpu"}


def _run(args, timeout=300):
    return subprocess.run(
        [sys.executable, "-m", "styletts_zs_tpu.cli", *args],
        capture_output=True, text=True, cwd=REPO, env=ENV, timeout=timeout)


def test_cli_synth_fixed_style(tmp_path):
    out = str(tmp_path / "mel.npy")
    r = _run(["synth", "--config", "configs/tiny.toml", "--text", "hello",
              "--fixed-style", "--out", out])
    assert r.returncode == 0, r.stderr[-2000:]
    mel = np.load(out)
    assert mel.ndim == 2 and np.isfinite(mel).all()


def test_cli_synth_zero_shot(tmp_path):
    out = str(tmp_path / "mel.npy")
    wav = str(tmp_path / "out.wav")
    r = _run(["synth", "--config", "configs/tiny.toml", "--text", "hi there",
              "--out", out, "--wav-out", wav])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out) and os.path.exists(wav)


def test_cli_train_stage1(tmp_path):
    r = _run(["train", "--config", "configs/tiny.toml", "--stage", "1",
              "--steps", "3", "--workdir", str(tmp_path)], timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "training done" in r.stdout


def test_cli_synth_ref_wav_off_rate(tmp_path):
    """--ref WAVs at a non-model sample rate are resampled + 3s-windowed."""
    from styletts_zs_tpu.pipelines.corpus import write_wav
    ref = str(tmp_path / "ref16k.wav")
    t = np.arange(16000) / 16000  # 1 s @ 16 kHz: off-rate AND short
    write_wav(ref, (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32),
              16000)
    out = str(tmp_path / "mel.npy")
    r = _run(["synth", "--config", "configs/tiny.toml", "--text", "hello",
              "--ref", ref, "--out", out])
    assert r.returncode == 0, r.stderr[-2000:]
    mel = np.load(out)
    assert np.isfinite(mel).all()


def test_eval_final_margin_multiseed(tmp_path):
    """scripts/eval_final_margin.py --seeds/--batch-seeds: the A1/A6 gate's
    robustness mode runs S sampling seeds x B fresh held-out speaker sets
    against a saved bundle and aggregates (mean/min) the margins."""
    import json

    import jax

    from styletts_zs_tpu.pipelines.checkpoint import save_params
    from styletts_zs_tpu.pipelines.factory import init_params
    from styletts_zs_tpu.utils.config import tiny_test_config

    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    save_params(str(tmp_path / "final"),
                {k: params[k] for k in ("acoustic", "vocoder", "diffusion")})
    out = str(tmp_path / "m.json")
    r = subprocess.run(
        [sys.executable, "scripts/eval_final_margin.py", "--tiny",
         "--workdir", str(tmp_path), "--seeds", "2", "--batch-seeds", "2",
         "--out", out],
        capture_output=True, text=True, cwd=REPO, env=ENV, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.load(open(out))
    assert res["n_runs"] == 4 and len(res["runs"]) == 4
    assert np.isfinite(res["sim_margin_mean"])
    assert res["sim_margin_min"] <= res["sim_margin_mean"]
    # headline compatibility: top-level sim_margin is the (b=0, s=0) gate run
    assert res["sim_margin"] == res["runs"][0]["sim_margin"]
