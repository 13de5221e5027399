"""Distributed tests on the 8-virtual-device CPU mesh (SURVEY.md §4.2)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from styletts_zs_tpu.parallel import bucketing, mesh as mesh_lib
from styletts_zs_tpu.parallel.sharding import param_shardings

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_mesh_shapes():
    mesh = mesh_lib.make_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh1 = mesh_lib.make_mesh()
    assert mesh1.shape["data"] == 8


def test_sharded_loss_equals_single_device():
    """DP correctness: mean loss on a sharded batch == unsharded loss."""
    mesh = mesh_lib.make_mesh(data=8, model=1)

    w = jnp.asarray(np.random.default_rng(0).standard_normal((16, 16)),
                    jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((32, 16)),
                    jnp.float32)

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    ref = jax.jit(loss)(w, x)
    xs = jax.device_put(x, mesh_lib.batch_sharding(mesh))
    ws = jax.device_put(w, mesh_lib.replicated(mesh))
    out = jax.jit(loss)(ws, xs)
    np.testing.assert_allclose(float(out), float(ref), rtol=1e-6)


def test_grad_psum_equivalence():
    """Sharded-batch gradients equal single-device gradients (DP semantics)."""
    mesh = mesh_lib.make_mesh(data=8, model=1)
    w = jnp.asarray(np.random.default_rng(0).standard_normal((8, 8)),
                    jnp.float32)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((16, 8)),
                    jnp.float32)
    g_ref = jax.jit(jax.grad(lambda w: jnp.mean((x @ w) ** 2)))(w)
    xs = jax.device_put(x, mesh_lib.batch_sharding(mesh))
    ws = jax.device_put(w, mesh_lib.replicated(mesh))
    g = jax.jit(jax.grad(lambda w: jnp.mean((xs @ w) ** 2)))(ws)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-6)


def test_param_sharding_rules():
    mesh = mesh_lib.make_mesh(data=4, model=2)
    params = {
        "big_kernel": jnp.zeros((512, 512)),   # shardable: 512 % 256 == 0
        "small": jnp.zeros((16, 16)),
        "bias": jnp.zeros((512,)),
    }
    sh = param_shardings(params, mesh)
    assert sh["big_kernel"].spec == P(None, mesh_lib.MODEL_AXIS)
    assert sh["small"].spec == P()
    assert sh["bias"].spec == P()


def test_metadata_all_gather_shard_map():
    """Length-bucket histogram exchange (BASELINE.json:5 metadata collective)."""
    from styletts_zs_tpu.parallel import collectives
    mesh = mesh_lib.make_mesh(data=8, model=1)
    lengths = jnp.arange(16, dtype=jnp.int32) * 40  # 0..600
    ls = jax.device_put(lengths, mesh_lib.batch_sharding(mesh))

    buckets = (256, 640)
    per_shard = collectives.gather_length_histograms(mesh, ls, buckets)
    assert per_shard.shape == (8, 2)
    total = np.asarray(per_shard).sum(0)
    assert total.sum() == 16
    assert total[0] == int(np.sum(np.asarray(lengths) <= 256))
    # local histogram matches bucketing.bucket_histogram exactly (shared
    # contract: overflow folds into the LAST bucket, so either transport
    # feeds plan_buckets)
    from styletts_zs_tpu.parallel import bucketing
    np_hist = np.asarray(collectives.length_histogram(lengths, buckets))
    assert np_hist.tolist() == bucketing.bucket_histogram(
        np.asarray(lengths), buckets).tolist()
    # overflow lengths (> last bucket) are counted, not dropped
    over = np.asarray(
        collectives.length_histogram(lengths, (256, 512)))
    assert over.sum() == 16
    assert over[1] == int(np.sum(np.asarray(lengths) > 256))


def test_stage1_train_step_dp_equivalence():
    """REAL program DP correctness: Stage1Trainer.train_step on a data=8
    mesh produces the same metrics as the unsharded step (VERDICT r1 §6a)."""
    from styletts_zs_tpu.pipelines import train as train_lib
    from styletts_zs_tpu.pipelines.data import SyntheticDataset
    from styletts_zs_tpu.pipelines.factory import init_params
    from styletts_zs_tpu.utils.config import tiny_test_config

    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.PRNGKey(0), with_discriminator=True)
    trainer = train_lib.Stage1Trainer(cfg)
    ds = SyntheticDataset(cfg.model, batch_size=8, seed=0, n_frames=64,
                          text_len=16)
    batch = ds.next_batch()
    rng = jax.random.PRNGKey(7)

    _, m_ref = trainer.train_step(trainer.init_state(params),
                                  train_lib.batch_to_device(batch), rng)
    m_ref = {k: float(v) for k, v in m_ref.items()}

    mesh = mesh_lib.make_mesh(data=8, model=1)
    rep = mesh_lib.replicated(mesh)
    state = jax.device_put(trainer.init_state(params), rep)
    batch_sh = train_lib.batch_to_device(batch, mesh_lib.batch_sharding(mesh))
    _, m_sh = trainer.train_step(state, batch_sh, jax.device_put(rng, rep))
    for k, v in m_sh.items():
        np.testing.assert_allclose(float(v), m_ref[k], rtol=2e-4, atol=1e-5,
                                   err_msg=f"metric {k} diverges under DP")


def test_synthesis_dp_equivalence():
    """REAL program DP correctness: the fused synthesis program sharded
    data=8 produces mel allclose to the unsharded run (VERDICT r1 §6b)."""
    from styletts_zs_tpu.pipelines.factory import init_params
    from styletts_zs_tpu.pipelines.infer import make_synthesis_fn
    from styletts_zs_tpu.utils.config import tiny_test_config

    cfg = tiny_test_config()
    m = cfg.model
    params = init_params(cfg, jax.random.PRNGKey(0))
    fn = jax.jit(make_synthesis_fn(cfg, one_step=True, with_vocoder=True,
                                   n_frames=m.max_frames))
    B, Tt = 8, m.max_text_len
    rng = jax.random.PRNGKey(0)
    ref_frames = 3 * m.audio.sample_rate // m.audio.hop_length
    args = (jax.random.randint(rng, (B, Tt), 1, 40),
            jnp.full((B,), Tt, jnp.int32),
            jax.random.normal(rng, (B, ref_frames, m.audio.n_mels)) * 0.5,
            jnp.full((B,), ref_frames, jnp.int32))
    out_ref, wav_ref = fn(params, *args, rng)

    mesh = mesh_lib.make_mesh(data=8, model=1)
    bs = mesh_lib.batch_sharding(mesh)
    rep = mesh_lib.replicated(mesh)
    out_sh, wav_sh = fn(jax.device_put(params, rep),
                        *[jax.device_put(a, bs) for a in args],
                        jax.device_put(rng, rep))
    np.testing.assert_allclose(np.asarray(out_sh.mel), np.asarray(out_ref.mel),
                               atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(wav_sh), np.asarray(wav_ref),
                               atol=2e-5, rtol=2e-5)


def test_bucketing_plan():
    lengths = np.array([100, 200, 300, 600, 1500, 5000])
    hist = bucketing.bucket_histogram(lengths)
    plan = bucketing.plan_buckets(hist, batch_size=2)
    assert plan.total_batches >= 3
    groups = bucketing.assign_to_buckets(lengths)
    assert sum(len(v) for v in groups.values()) == len(lengths)
    batch = bucketing.pad_batch([np.ones((3, 2)), np.ones((5, 2))], 8)
    assert batch.shape == (2, 8, 2)


def test_style_code_all_gather_shard_map():
    """Style-code table exchange — the second named metadata collective of
    BASELINE.json:5 ("style-code and length metadata")."""
    from styletts_zs_tpu.parallel import collectives
    mesh = mesh_lib.make_mesh(data=8, model=1)
    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.standard_normal((16, 4, 6)), jnp.float32)
    sharded = jax.device_put(codes, mesh_lib.batch_sharding(mesh))

    table = collectives.gather_style_codes(mesh, sharded)
    assert table.shape == (16, 4, 6)
    # replicated output must equal the global input table bit-exactly
    np.testing.assert_array_equal(np.asarray(table), np.asarray(codes))
    # 2-D summaries take the same path
    summ = jax.device_put(jnp.asarray(rng.standard_normal((8, 5)),
                                      jnp.float32),
                          mesh_lib.batch_sharding(mesh))
    t2 = collectives.gather_style_codes(mesh, summ)
    np.testing.assert_array_equal(np.asarray(t2), np.asarray(summ))
    # single-process DCN twin degenerates to identity
    np.testing.assert_array_equal(
        collectives.process_concat_styles(np.asarray(codes)),
        np.asarray(codes))


def test_mixed_speaker_order():
    """Round-robin style-cluster interleave: deterministic, a permutation,
    and consecutive batches mix clusters when possible."""
    idxs = np.arange(12, dtype=np.int32)
    # 3 clusters of 4 members each (cluster id = idx % 3 pattern)
    cluster_ids = np.asarray([0, 1, 2] * 4 + [99] * 4)  # extra ids unused
    order = bucketing.mixed_speaker_order(idxs, cluster_ids[:16])
    assert sorted(order.tolist()) == idxs.tolist()
    # each batch of 3 holds 3 distinct clusters (round-robin)
    for s in range(0, 12, 3):
        batch = order[s: s + 3]
        assert len({int(cluster_ids[i]) for i in batch}) == 3
    # deterministic
    order2 = bucketing.mixed_speaker_order(idxs, cluster_ids[:16])
    np.testing.assert_array_equal(order, order2)
    # empty style table: no requests -> no ids, no crash (ADVICE r3)
    assert bucketing.style_cluster_ids(np.zeros((0, 16))).shape == (0,)


def test_style_cluster_ids_separate_speakers():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((1, 16)) * 0.01
    styles = np.concatenate([a + 3.0, a - 3.0] * 4, axis=0)  # 2 speakers
    ids = bucketing.style_cluster_ids(styles)
    assert len(np.unique(ids)) == 2
    # same-speaker rows hash identically
    assert (ids[::2] == ids[0]).all() and (ids[1::2] == ids[1]).all()
