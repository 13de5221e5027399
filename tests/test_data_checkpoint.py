"""grain loader, checkpoint roundtrip, verify gate, long-form decoder path."""
import jax
import jax.numpy as jnp
import numpy as np

from styletts_zs_tpu.pipelines import data as D
from styletts_zs_tpu.utils.config import replace, tiny_test_config

CFG = tiny_test_config()


def test_grain_loader_batches():
    loader = D.make_grain_loader(CFG.model, batch_size=2, n_frames=64,
                                 text_len=16, n_items=8)
    it = iter(loader)
    b = next(it)
    assert b["phonemes"].shape == (2, 16)
    assert b["wav"].shape[0] == 2
    assert np.isfinite(b["f0"]).all()
    b2 = next(it)
    assert not np.array_equal(b["phonemes"], b2["phonemes"])


def test_grain_sharding_disjoint():
    a = D.make_grain_loader(CFG.model, batch_size=2, n_frames=64, text_len=16,
                            n_items=16, shard_index=0, shard_count=2)
    b = D.make_grain_loader(CFG.model, batch_size=2, n_frames=64, text_len=16,
                            n_items=16, shard_index=1, shard_count=2)
    ba, bb = next(iter(a)), next(iter(b))
    assert not np.array_equal(ba["phonemes"], bb["phonemes"])


def test_checkpoint_roundtrip(tmp_path):
    from styletts_zs_tpu.pipelines.checkpoint import load_params, save_params
    params = {"a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
              "nested": {"b": jnp.ones((4,))}}
    p = str(tmp_path / "ckpt")
    save_params(p, params)
    back = load_params(p, like=jax.tree.map(jnp.zeros_like, params))
    np.testing.assert_array_equal(np.asarray(back["a"]), np.asarray(params["a"]))
    np.testing.assert_array_equal(np.asarray(back["nested"]["b"]),
                                  np.asarray(params["nested"]["b"]))


def test_checkpoint_manager(tmp_path):
    from styletts_zs_tpu.pipelines.checkpoint import CheckpointManager
    mgr = CheckpointManager(str(tmp_path / "mgr"), keep=2)
    tree = {"w": jnp.ones((3, 3))}
    for step in (10, 20, 30):
        mgr.save(step, jax.tree.map(lambda x: x * step, tree))
    mgr.wait()
    assert mgr.latest_step() == 30
    back = mgr.restore(like=tree)
    np.testing.assert_allclose(np.asarray(back["w"]), 30.0)
    mgr.close()


def test_verify_gate_small():
    from styletts_zs_tpu.pipelines.verify import run_verification
    rep = run_verification(max_frames=64, batch=1)
    assert rep["pass_fp32"], rep
    assert rep["fp32_pallas"]["dur_match"] == 1.0
    assert rep["bf16_pallas"]["mel_mae"] < 1.0, rep


def test_longform_multichunk_decoder():
    """Decoder with T >> window exercises the multi-chunk attention path."""
    from styletts_zs_tpu.models.decoder import MelDecoder
    cfg = replace(CFG.model.decoder, attn_window=64)
    model = MelDecoder(cfg, n_mels=CFG.model.audio.n_mels)
    rng = jax.random.PRNGKey(0)
    T = 512
    aligned = jax.random.normal(rng, (1, T, 32))
    f0 = jnp.zeros((1, T))
    en = jnp.zeros((1, T))
    style = jax.random.normal(rng, (1, T, CFG.model.style.d_style))
    params = model.init(rng, aligned, f0, en, style)
    mel = model.apply(params, aligned, f0, en, style)
    assert mel.shape == (1, T, CFG.model.audio.n_mels)
    assert np.isfinite(np.asarray(mel)).all()
