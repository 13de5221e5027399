"""Aligner ops: forward-sum loss and MAS duration extraction."""
import jax
import jax.numpy as jnp
import numpy as np

from styletts_zs_tpu.ops import align


def test_forward_sum_prefers_true_alignment():
    """Log-probs peaked on a monotonic path give lower loss than uniform."""
    B, T, N = 1, 12, 4
    true_path = np.array([0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 3])
    peaked = np.full((B, T, N), -8.0, np.float32)
    for t, i in enumerate(true_path):
        peaked[0, t, i] = -0.05
    uniform = np.full((B, T, N), -np.log(N), np.float32)
    tl = jnp.array([N])
    fl = jnp.array([T])
    l_peaked = float(align.forward_sum_loss(jnp.asarray(peaked), tl, fl))
    l_uniform = float(align.forward_sum_loss(jnp.asarray(uniform), tl, fl))
    assert np.isfinite(l_peaked) and np.isfinite(l_uniform)
    assert l_peaked < l_uniform


def test_forward_sum_grad_finite():
    B, T, N = 2, 10, 4
    rng = np.random.default_rng(0)
    lp = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((B, T, N)).astype(np.float32)), -1)
    g = jax.grad(lambda x: align.forward_sum_loss(
        x, jnp.array([4, 3]), jnp.array([10, 8])))(lp)
    assert np.isfinite(np.asarray(g)).all()


def test_mas_recovers_planted_alignment():
    B, T, N = 1, 12, 4
    true_dur = np.array([3, 4, 2, 3])
    energies = np.full((B, T, N), -5.0, np.float32)
    pos = 0
    for i, d in enumerate(true_dur):
        energies[0, pos: pos + d, i] = 5.0
        pos += d
    dur = align.monotonic_alignment_search(
        jnp.asarray(energies), jnp.array([N]), jnp.array([T]))
    d = np.asarray(dur)[0]
    assert d.sum() == T
    np.testing.assert_array_equal(d, true_dur)


def test_mas_masked_lengths():
    B, T, N = 2, 16, 5
    rng = np.random.default_rng(1)
    energies = jnp.asarray(rng.standard_normal((B, T, N)).astype(np.float32))
    tl = jnp.array([5, 3])
    fl = jnp.array([16, 10])
    dur = np.asarray(align.monotonic_alignment_search(energies, tl, fl))
    assert dur[0].sum() == 16
    assert dur[1, :3].sum() == 10
    assert (dur[1, 3:] == 0).all()
    # monotonic coverage: every phoneme within length gets >= 1 frame
    assert (dur[0] >= 1).all()
    assert (dur[1, :3] >= 1).all()
