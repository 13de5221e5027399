"""Training-dynamics smoke tests (SURVEY.md §4.2): loss decreases, no NaNs."""
import jax
import numpy as np
import pytest

from styletts_zs_tpu.pipelines import train as T
from styletts_zs_tpu.pipelines.data import SyntheticDataset
from styletts_zs_tpu.pipelines.factory import init_params
from styletts_zs_tpu.utils.config import tiny_test_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config()
    params = init_params(cfg, jax.random.PRNGKey(0), with_discriminator=True)
    ds = SyntheticDataset(cfg.model, batch_size=2, seed=0, n_frames=64,
                          text_len=16)
    batch = T.batch_to_device(ds.next_batch())
    return cfg, params, batch


def test_stage1_overfit_smoke(setup):
    cfg, params, batch = setup
    tr = T.Stage1Trainer(cfg)
    state = tr.init_state(params)
    losses = []
    for i in range(8):
        state, metrics = tr.train_step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["mel"]))
        for k, v in metrics.items():
            assert np.isfinite(float(v)), f"{k} not finite at step {i}"
    assert losses[-1] < losses[0], f"mel loss did not decrease: {losses}"


def test_stage2_diffusion_step(setup):
    cfg, params, batch = setup
    tr = T.Stage2Trainer(cfg)
    state = tr.init_state(params["diffusion"])
    l0 = None
    for i in range(4):
        state, aux = tr.train_step(state, params["acoustic"], batch,
                                   jax.random.PRNGKey(i))
        assert np.isfinite(float(aux["diff"]))
        if l0 is None:
            l0 = float(aux["diff"])
    assert int(state["step"]) == 4


def test_stage3_distill_step(setup):
    cfg, params, batch = setup
    tr = T.Stage3Trainer(cfg, n_teacher_steps=2)
    state = tr.init_state(params["diffusion"])
    state, aux = tr.train_step(state, params["diffusion"],
                               params["acoustic"], batch,
                               jax.random.PRNGKey(0))
    for k in ("latent", "perceptual"):
        assert np.isfinite(float(aux[k]))


def test_stage1_speaker_contrastive_trains_prompt_encoder(setup):
    """VERDICT r3 items 1/3: the InfoNCE loss is the prompt encoder's ONLY
    gradient in the pipeline — it must appear in the metrics, be finite,
    and actually move the prompt-encoder params (they were frozen at init
    in r1-r3, the root cause of the collapsed speaker embedding)."""
    cfg, params, batch = setup
    tr = T.Stage1Trainer(cfg)
    state = tr.init_state(params)
    pe0 = jax.tree.map(np.array, state.g_params["acoustic"]["params"]
                       ["prompt_encoder"])
    nce = []
    for i in range(6):
        state, metrics = tr.train_step(state, batch, jax.random.PRNGKey(i))
        for k in ("spk_nce", "spk_acc", "fsq_sample_ent", "fsq_code_ent"):
            assert k in metrics and np.isfinite(float(metrics[k])), k
        nce.append(float(metrics["spk_nce"]))
    pe1 = state.g_params["acoustic"]["params"]["prompt_encoder"]
    moved = jax.tree.map(lambda a, b: float(np.abs(a - np.asarray(b)).max()),
                         pe0, pe1)
    assert max(jax.tree.leaves(moved)) > 0, "prompt encoder still frozen"
    assert nce[-1] < nce[0] + 1e-3, f"InfoNCE did not move down: {nce}"


def test_stage1_speaker_cycle_consistency_views(setup):
    """r4 diagnosis (docs/artifacts/prompt_influence_r4.json): the embedding
    retrieved real audio perfectly but read SYNTHESIZED mels as
    out-of-distribution (teacher-forced decode: 0/16 retrieval).  The
    cycle-consistency views must (a) appear in the metrics and (b) put
    gradient on the DECODER through the reconstructed-mel view — i.e. the
    synthesis path is trained to preserve speaker identity (A1/A6)."""
    import jax.numpy as jnp
    cfg, params, batch = setup
    tr = T.Stage1Trainer(cfg)
    state = tr.init_state(params)
    state, metrics = tr.train_step(state, batch, jax.random.PRNGKey(3))
    for k in ("spk_nce_rec", "spk_nce_voc"):
        assert k in metrics and np.isfinite(float(metrics[k])), k
    # gradient flow: the rec/voc views must contribute decoder gradients.
    # Compare g_loss grads with and without the views on the same inputs.
    from styletts_zs_tpu.utils.config import replace
    g, _ = jax.grad(tr.g_loss, has_aux=True)(
        state.g_params, state.d_params, batch, jax.random.PRNGKey(4))
    tr_off = T.Stage1Trainer(replace(cfg, train=replace(
        cfg.train, w_spk_rec=0.0, w_spk_voc=0.0)))
    g_off, _ = jax.grad(tr_off.g_loss, has_aux=True)(
        state.g_params, state.d_params, batch, jax.random.PRNGKey(4))
    diff = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        g["acoustic"]["params"]["decoder"],
        g_off["acoustic"]["params"]["decoder"])
    base = jax.tree.map(lambda a: float(jnp.max(jnp.abs(a))),
                        g_off["acoustic"]["params"]["decoder"])
    # relative threshold (ADVICE r4): float reassociation noise between the
    # two structurally-different graphs is ~1e-7 relative; a real view
    # contribution is O(1) relative to the baseline grad magnitude
    rel = max(jax.tree.leaves(diff)) / max(max(jax.tree.leaves(base)), 1e-12)
    assert rel > 1e-3, \
        f"cycle-consistency views add no meaningful decoder gradient ({rel})"


def test_stage1_step_no_nans_with_debug_nans(setup):
    """SURVEY.md §5.2: jax_debug_nans smoke — a step raises on any NaN."""
    cfg, params, batch = setup
    tr = T.Stage1Trainer(cfg)
    state = tr.init_state(params)
    try:
        jax.config.update("jax_debug_nans", True)
        state, metrics = tr.train_step(state, batch, jax.random.PRNGKey(99))
        _ = float(metrics["total_g"])
    finally:
        jax.config.update("jax_debug_nans", False)
