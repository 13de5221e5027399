"""Serving pipeline + config loading tests."""
import os

import jax
import numpy as np
import pytest

from styletts_zs_tpu.pipelines.factory import init_params
from styletts_zs_tpu.pipelines.serve import Request, Server
from styletts_zs_tpu.utils import text as text_utils
from styletts_zs_tpu.utils.config import load_config, replace, tiny_test_config

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


@pytest.mark.parametrize("name", ["cpu_ref", "zs_batch8", "multistep_b32",
                                  "longform_60s", "pod_v5e16"])
def test_acceptance_configs_load(name):
    cfg = load_config(os.path.join(CONFIG_DIR, f"{name}.toml"))
    assert cfg.name == name
    # invariant: vocoder total upsampling == audio hop
    up = 1
    for r in cfg.model.vocoder.upsample_rates:
        up *= r
    assert up * cfg.model.vocoder.istft_hop == cfg.model.audio.hop_length


def test_serve_bucketed_batches():
    cfg = tiny_test_config()
    cfg = replace(cfg, serve=replace(cfg.serve, batch_size=2,
                                     frame_buckets=(64, 128),
                                     with_vocoder=False, one_step=True))
    params = init_params(cfg, jax.random.PRNGKey(0))
    server = Server(cfg, params)
    rng = np.random.default_rng(0)
    reqs = [
        Request(uid=i,
                phonemes=np.asarray(text_utils.text_to_ids("hello there"),
                                    np.int32),
                ref_wav=rng.standard_normal(8000).astype(np.float32) * 0.1,
                est_frames=50 if i < 3 else 100)
        for i in range(5)
    ]
    results = server.serve_batch(reqs)
    assert len(results) == 5
    uids = sorted(r.uid for r in results)
    assert uids == [0, 1, 2, 3, 4]
    for r in results:
        assert r.mel.ndim == 2 and np.isfinite(r.mel).all()
    assert not server.requeued


def test_text_frontend():
    ids = text_utils.text_to_ids("ab c")
    assert ids[0] == text_utils.BOS_ID and ids[-1] == text_utils.EOS_ID
    assert len(ids) == 6
    ph = text_utils.phonemes_to_ids(["HH", "AH", "L", "OW"])
    assert all(i != text_utils.UNK_ID for i in ph)
    padded = text_utils.pad_ids(ids, 10)
    assert len(padded) == 10 and padded[-1] == text_utils.PAD_ID
    assert text_utils.VOCAB_SIZE < 192  # fits the model vocab default


def test_serve_with_mesh_sharded_batches():
    """Server dispatch with a data-parallel mesh (virtual devices)."""
    import jax
    from styletts_zs_tpu.parallel import mesh as mesh_lib
    if len(jax.devices()) < 2:
        pytest.skip("needs 2+ devices")
    cfg = tiny_test_config()
    cfg = replace(cfg, serve=replace(cfg.serve, batch_size=2,
                                     frame_buckets=(64,),
                                     with_vocoder=False, one_step=True))
    params = init_params(cfg, jax.random.PRNGKey(0))
    mesh = mesh_lib.make_mesh(data=2, model=1, devices=jax.devices()[:2])
    server = Server(cfg, params, mesh=mesh)
    rng = np.random.default_rng(0)
    reqs = [Request(uid=i,
                    phonemes=np.asarray(text_utils.text_to_ids("mesh req"),
                                        np.int32),
                    ref_wav=rng.standard_normal(8000).astype(np.float32) * 0.1,
                    est_frames=50)
            for i in range(4)]
    results = server.serve_batch(reqs)
    assert len(results) == 4 and not server.requeued


def test_sampler_reproducible_given_rng():
    import jax
    from styletts_zs_tpu.pipelines.infer import Synthesizer
    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    syn = Synthesizer(cfg, params)
    import jax.numpy as jnp
    ph = jnp.ones((1, 8), jnp.int32)
    ref = jnp.zeros((1, 8000))
    r = jax.random.PRNGKey(7)
    out1, _ = syn.synthesize(ph, ref, rng=r, n_frames=64, with_vocoder=False)
    out2, _ = syn.synthesize(ph, ref, rng=r, n_frames=64, with_vocoder=False)
    np.testing.assert_array_equal(np.asarray(out1.mel), np.asarray(out2.mel))


def test_serving_contract_scale_plan_parity():
    """Level-5 mechanism at a reduced count: every request completes, the
    collective-derived plan matches the served batch counts, and the
    style-code table covers all requests (BASELINE.json:11; the full
    4096-request run is the committed artifact
    docs/artifacts/acceptance_l5_4096_cpu8.json)."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from styletts_zs_tpu.pipelines.acceptance import run_acceptance
    rep = run_acceptance(5, full_size=False, n_requests=48, use_mesh=True)
    assert rep["completed"] == 48 and rep["requeued"] == 0
    assert rep["plan_matches_served"]
    assert rep["style_table_shape"][0] == 48
    assert rep["mesh"] == "{'data': 8, 'model': 1}"
