"""On-disk corpus round-trip: export synthetic -> DiskCorpus -> train step.

Covers the real-corpus loading path (SURVEY.md §3.3 data loader; round-1
VERDICT known gap "real-corpus data loading").
"""
import json
import os

import numpy as np
import pytest

from styletts_zs_tpu.pipelines import corpus as C
from styletts_zs_tpu.utils.config import tiny_test_config


@pytest.fixture(scope="module")
def corpus_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus"))
    cfg = tiny_test_config().model
    C.export_synthetic_corpus(root, cfg, n_utts=8, n_speakers=2,
                              n_frames=64, text_len=16, seed=3)
    return root


def test_wav_roundtrip(tmp_path):
    sr = 16000
    wav = (0.5 * np.sin(2 * np.pi * 440 * np.arange(sr) / sr)).astype(
        np.float32)
    path = str(tmp_path / "t.wav")
    C.write_wav(path, wav, sr)
    back, sr2 = C.read_wav(path)
    assert sr2 == sr
    np.testing.assert_allclose(back, wav, atol=1.0 / 32000)


def test_resample_linear_preserves_tone():
    sr_in, sr_out = 24000, 16000
    t = np.arange(sr_in) / sr_in
    wav = np.sin(2 * np.pi * 100 * t).astype(np.float32)
    out = C.resample_linear(wav, sr_in, sr_out)
    assert abs(len(out) - sr_out) <= 1
    t2 = np.arange(len(out)) / sr_out
    np.testing.assert_allclose(out, np.sin(2 * np.pi * 100 * t2), atol=5e-3)


def test_disk_corpus_examples(corpus_root):
    cfg = tiny_test_config().model
    ds = C.DiskCorpus(corpus_root, cfg, n_frames=64, text_len=16)
    assert len(ds) == 8
    ex = ds[0]
    assert ex["phonemes"].shape == (16,)
    assert ex["wav"].shape == (64 * cfg.audio.hop_length,)
    assert ex["f0"].shape == (64,)
    assert int(ex["text_lengths"]) > 0
    assert int(ex["frame_lengths"]) >= 8
    # durations were annotated -> loaded and budget-clipped
    assert ex["durations"].sum() <= 64
    assert ex["durations"].sum() > 0
    # same-speaker reference is a different utterance's audio
    ex1 = ds[1]
    L = min(len(ex["ref_wav"]), len(ex["wav"]))
    assert not np.allclose(ex["ref_wav"][:L], ex["wav"][:L])
    assert ex["ref_wav"].any() and ex1["ref_wav"].any()


def test_disk_corpus_text_fallback(tmp_path):
    cfg = tiny_test_config().model
    root = str(tmp_path)
    os.makedirs(os.path.join(root, "wavs"))
    wav = np.zeros(cfg.audio.hop_length * 16, np.float32)
    wav[: 800] = 0.1
    C.write_wav(os.path.join(root, "wavs", "a.wav"), wav,
                cfg.audio.sample_rate)
    with open(os.path.join(root, "metadata.jsonl"), "w") as f:
        f.write(json.dumps({"id": "a", "text": "hello world"}) + "\n")
    ds = C.DiskCorpus(root, cfg, n_frames=16, text_len=24)
    ex = ds[0]
    assert int(ex["text_lengths"]) > 2  # letters tokenized
    assert ex["durations"].sum() == 0   # none annotated -> MAS at train time


def test_corpus_grain_loader_feeds_training(corpus_root):
    import jax
    import jax.numpy as jnp

    from styletts_zs_tpu.pipelines import train as T
    from styletts_zs_tpu.pipelines.factory import init_params

    cfg = tiny_test_config()
    loader = C.make_corpus_loader(corpus_root, cfg.model, batch_size=2,
                                  n_frames=64, text_len=16, seed=0)
    batch_np = next(iter(loader))
    params = init_params(cfg, jax.random.PRNGKey(0), with_discriminator=True)
    trainer = T.Stage1Trainer(cfg)
    state = trainer.init_state(params)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(0))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
