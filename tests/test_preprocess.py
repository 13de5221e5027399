"""Corpus preprocessing -> training batch contract; trains a stage-1 step."""
import jax
import numpy as np

from styletts_zs_tpu.pipelines import preprocess as P
from styletts_zs_tpu.pipelines import train as T
from styletts_zs_tpu.pipelines.factory import init_params
from styletts_zs_tpu.utils.config import tiny_test_config

CFG = tiny_test_config()


def _utt(seed, f0=160.0, secs=0.6):
    rng = np.random.default_rng(seed)
    sr = CFG.model.audio.sample_rate
    t = np.arange(int(sr * secs)) / sr
    wav = (0.4 * np.sin(2 * np.pi * f0 * t)
           + 0.02 * rng.standard_normal(len(t))).astype(np.float32)
    n_ph = 10
    return P.Utterance(
        phonemes=rng.integers(5, 40, n_ph).astype(np.int32),
        wav=wav,
        durations=np.full((n_ph,), 5, np.int32))


def test_featurize_contract():
    ex = P.featurize(_utt(0), CFG.model, n_frames=64, text_len=16,
                     ref_wav=_utt(1).wav)
    assert ex["phonemes"].shape == (16,)
    assert ex["f0"].shape == (64,)
    assert ex["wav"].shape == (64 * CFG.model.audio.hop_length,)
    assert ex["durations"].sum() <= ex["frame_lengths"]
    # voiced tone -> nonzero normalized log-F0 somewhere
    assert np.abs(ex["f0"]).max() > 0
    assert np.isfinite(ex["energy"]).all()


def test_collated_batch_trains():
    batch = P.collate([
        P.featurize(_utt(i, f0=140.0 + 20 * i), CFG.model, n_frames=64,
                    text_len=16)
        for i in range(2)
    ])
    params = init_params(CFG, jax.random.PRNGKey(0), with_discriminator=True)
    tr = T.Stage1Trainer(CFG)
    state = tr.init_state(params)
    batch_dev = {k: jax.numpy.asarray(v) for k, v in batch.items()}
    state, metrics = tr.train_step(state, batch_dev, jax.random.PRNGKey(0))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
