"""Alignment and upsampling ops: phoneme-rate -> frame-rate.

TPU-first: length expansion is a dense (T_frames x T_text) alignment-matrix
matmul — static shapes, MXU-friendly — instead of ragged gathers
(SURVEY.md §2.2 "Alignment/upsampling").  Also hosts the style-code
interpolation (fixed-length K codes stretched over the utterance — claim A3
of ``/root/reference/README.md:5``) and the training-time monotonic aligner
(forward-sum loss; SURVEY.md §7.2 item 4).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def alignment_matrix(durations: jax.Array, n_frames: int) -> jax.Array:
    """Hard monotonic alignment expansion matrix.

    durations: (B, T_text) non-negative frame counts (int or float).
    Returns A: (B, n_frames, T_text) with A[b, t, i] = 1 iff frame t belongs
    to phoneme i (cumulative intervals).  frames @ A gives frame-rate copies.
    """
    cum = jnp.cumsum(durations.astype(jnp.float32), axis=-1)  # (B, Tt)
    start = cum - durations.astype(jnp.float32)
    t = jnp.arange(n_frames, dtype=jnp.float32)[None, :, None]
    return ((t >= start[:, None, :]) & (t < cum[:, None, :])).astype(jnp.float32)


def expand_by_duration(x: jax.Array, durations: jax.Array,
                       n_frames: int) -> jax.Array:
    """x: (B, T_text, C), durations: (B, T_text) -> (B, n_frames, C)."""
    A = alignment_matrix(durations, n_frames)
    return jnp.einsum("bti,bic->btc", A, x,
                      preferred_element_type=jnp.float32).astype(x.dtype)


def interp_style_matrix(lengths: jax.Array, n_codes: int,
                        n_frames: int) -> jax.Array:
    """Linear-interpolation matrix stretching K style codes over each utterance.

    lengths: (B,) actual frame counts. Returns W: (B, n_frames, K) where
    frame t maps to fractional code position t/(len-1)*(K-1); frames beyond
    ``lengths`` hold the last code (harmless — they are masked downstream).
    """
    t = jnp.arange(n_frames, dtype=jnp.float32)[None, :]           # (1, T)
    denom = jnp.maximum(lengths.astype(jnp.float32) - 1.0, 1.0)[:, None]
    pos = jnp.clip(t / denom, 0.0, 1.0) * (n_codes - 1)            # (B, T)
    k = jnp.arange(n_codes, dtype=jnp.float32)[None, None, :]      # (1, 1, K)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, :, None] - k))       # (B, T, K)
    return w / jnp.maximum(w.sum(-1, keepdims=True), 1e-8)


def stretch_style_codes(codes: jax.Array, lengths: jax.Array,
                        n_frames: int) -> jax.Array:
    """codes: (B, K, d) fixed-length time-varying style -> (B, n_frames, d)."""
    W = interp_style_matrix(lengths, codes.shape[1], n_frames)
    return jnp.einsum("btk,bkd->btd", W, codes,
                      preferred_element_type=jnp.float32).astype(codes.dtype)


# ---------------------------------------------------------------------------
# Training-time monotonic aligner (self-contained; no pretrained ASR aligner
# is downloadable in this offline environment — SURVEY.md §7.0).
# ---------------------------------------------------------------------------

def forward_sum_loss(log_probs: jax.Array, text_lengths: jax.Array,
                     frame_lengths: jax.Array) -> jax.Array:
    """CTC-style forward-sum alignment loss over a (B, T_frames, T_text) lattice.

    log_probs[b, t, i]: log p(frame t | phoneme i) (e.g. log-softmax over the
    text axis of an attention-energy matrix).  Monotonic paths advance the
    text index by 0 or 1 per frame and must end at the last phoneme.
    Computed with a log-space ``lax.scan`` over frames.
    """
    B, T, N = log_probs.shape
    neg = -1e30
    # alpha[b, i] after consuming frame t
    init = jnp.full((B, N), neg).at[:, 0].set(log_probs[:, 0, 0])

    def step(alpha, lp_t):
        stay = alpha
        move = jnp.concatenate(
            [jnp.full((B, 1), neg), alpha[:, :-1]], axis=1)
        new = jnp.logaddexp(stay, move) + lp_t
        return new, None

    # scan over frames 1..T-1; mask frames beyond each utterance's length by
    # making them no-ops (alpha passes through unchanged)
    def masked_step(carry, inp):
        alpha, = carry
        lp_t, t_idx = inp
        new, _ = step(alpha, lp_t)
        valid = (t_idx < frame_lengths)[:, None]
        return (jnp.where(valid, new, alpha),), None

    ts = jnp.arange(1, T)
    (alpha,), _ = jax.lax.scan(
        masked_step, (init,), (jnp.swapaxes(log_probs[:, 1:], 0, 1), ts))
    final = jnp.take_along_axis(
        alpha, (text_lengths - 1)[:, None], axis=1)[:, 0]
    return -jnp.mean(final / jnp.maximum(frame_lengths.astype(jnp.float32), 1.0))


def monotonic_alignment_search(energies: jax.Array, text_lengths: jax.Array,
                               frame_lengths: jax.Array) -> jax.Array:
    """Hard MAS durations via Viterbi over the monotonic lattice.

    energies: (B, T_frames, T_text) similarity scores (higher = better).
    Returns durations (B, T_text) int32 summing to frame_lengths.
    Implemented as a forward Viterbi ``lax.scan`` storing argmax bits, then a
    backward ``lax.scan`` to read off the path.  Used as the training-time
    duration target extractor (build-time tool, SURVEY.md §2.2).
    """
    B, T, N = energies.shape
    neg = -1e30
    init = jnp.full((B, N), neg).at[:, 0].set(energies[:, 0, 0])

    def fwd(alpha, e_t):
        stay = alpha
        move = jnp.concatenate([jnp.full((B, 1), neg), alpha[:, :-1]], axis=1)
        took_move = move > stay
        new = jnp.where(took_move, move, stay) + e_t
        return new, took_move

    def fwd_masked(alpha, inp):
        e_t, t_idx = inp
        new, took = fwd(alpha, e_t)
        valid = (t_idx < frame_lengths)[:, None]
        return jnp.where(valid, new, alpha), jnp.where(valid, took, False)

    alpha, moves = jax.lax.scan(
        fwd_masked, init, (jnp.swapaxes(energies[:, 1:], 0, 1),
                           jnp.arange(1, T)))
    # moves: (T-1, B, N) whether text index advanced entering frame t

    last_i = text_lengths - 1

    def bwd(i_cur, inp):
        # emits the text index at frame t, then steps the carry to frame t-1
        took_t, t_idx = inp  # (B, N), scalar t
        valid = t_idx < frame_lengths
        took = jnp.take_along_axis(took_t, i_cur[:, None], axis=1)[:, 0]
        i_prev = jnp.where(valid & took, i_cur - 1, i_cur)
        return i_prev, i_cur

    i0, idx_rev = jax.lax.scan(
        bwd, last_i, (moves[::-1], jnp.arange(T - 1, 0, -1)))
    # idx_rev[j] = text index at frame T-1-j (frames T-1..1); i0 = frame 0
    frame_text_idx = jnp.concatenate(
        [i0[None, :], idx_rev[::-1]], axis=0).T  # (B, T)
    one_hot = jax.nn.one_hot(frame_text_idx, N, dtype=jnp.float32)
    frame_valid = (jnp.arange(T)[None, :] < frame_lengths[:, None]).astype(jnp.float32)
    durations = jnp.einsum("bt,btn->bn", frame_valid, one_hot)
    return durations.astype(jnp.int32)
