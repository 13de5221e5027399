"""Attention ops: full MHA and chunk-local (windowed) attention — XLA paths.

Chunk-local semantics (the spec both the XLA twin and the Pallas kernel
implement, per SURVEY.md §2.3): queries in chunk ``c`` attend to keys in
chunks ``c-1, c, c+1`` (chunk size = ``chunk`` frames).  This gives O(T·3W)
cost for long-form 60 s utterances (``BASELINE.json:10``) instead of O(T²).

Layout: (B, T, H, D) with D on the lane axis.  Softmax in fp32 always.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def mha(q: jax.Array, k: jax.Array, v: jax.Array, *,
        mask: jax.Array | None = None, scale: float | None = None) -> jax.Array:
    """Full multi-head attention.

    q: (B, Tq, H, D), k/v: (B, Tk, H, D); mask: broadcastable to
    (B, H, Tq, Tk), True = attend. Returns (B, Tq, H, D).
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def chunk_band_mask(t_q: int, t_k: int, chunk: int) -> jax.Array:
    """(t_q, t_k) bool mask: True where key chunk within ±1 of query chunk."""
    qc = jnp.arange(t_q)[:, None] // chunk
    kc = jnp.arange(t_k)[None, :] // chunk
    return jnp.abs(qc - kc) <= 1


def length_mask(lengths: jax.Array, t: int) -> jax.Array:
    """(B,) lengths -> (B, t) bool validity mask."""
    return jnp.arange(t)[None, :] < lengths[:, None]


def local_attention_reference(q, k, v, *, chunk: int,
                              kv_mask: jax.Array | None = None) -> jax.Array:
    """Chunk-local attention via full attention + band mask (the golden twin)."""
    t_q, t_k = q.shape[1], k.shape[1]
    mask = chunk_band_mask(t_q, t_k, chunk)[None, None]
    if kv_mask is not None:
        mask = mask & kv_mask[:, None, None, :]
    return mha(q, k, v, mask=mask)


def local_attention(q, k, v, *, chunk: int,
                    kv_mask: jax.Array | None = None) -> jax.Array:
    """Chunk-local attention, O(T·3W): gather [prev|self|next] key chunks.

    Self-attention only (t_q == t_k, multiple of ``chunk``).  Matches
    ``local_attention_reference`` exactly (same softmax, fp32).  When the
    sequence fits in one chunk the band covers everything — plain full
    attention (used at init time and for short utterances).
    """
    B, T, H, D = q.shape
    if T <= chunk:
        mask = None if kv_mask is None else kv_mask[:, None, None, :]
        return mha(q, k, v, mask=mask)
    assert T % chunk == 0, f"T={T} not a multiple of chunk={chunk}"
    n = T // chunk
    scale = D ** -0.5

    qc = q.reshape(B, n, chunk, H, D)
    kc = k.reshape(B, n, chunk, H, D)
    vc = v.reshape(B, n, chunk, H, D)

    def neighbors(x):  # (B, n, chunk, H, D) -> (B, n, 3*chunk, H, D)
        pad = jnp.zeros_like(x[:, :1])
        prev = jnp.concatenate([pad, x[:, :-1]], axis=1)
        nxt = jnp.concatenate([x[:, 1:], pad], axis=1)
        return jnp.concatenate([prev, x, nxt], axis=2)

    kn = neighbors(kc)
    vn = neighbors(vc)

    valid = jnp.ones((B, n, chunk), dtype=bool)
    if kv_mask is not None:
        valid = kv_mask.reshape(B, n, chunk)
    pad = jnp.zeros_like(valid[:, :1])
    prev_v = jnp.concatenate([pad, valid[:, :-1]], axis=1)
    next_v = jnp.concatenate([valid[:, 1:], pad], axis=1)
    kv_valid = jnp.concatenate([prev_v, valid, next_v], axis=2)  # (B, n, 3c)

    logits = jnp.einsum("bnqhd,bnkhd->bnhqk", qc, kn,
                        preferred_element_type=jnp.float32) * scale
    logits = jnp.where(kv_valid[:, :, None, None, :], logits, NEG_INF)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bnhqk,bnkhd->bnqhd", probs.astype(vc.dtype), vn,
                     preferred_element_type=jnp.float32)
    return out.reshape(B, T, H, D).astype(q.dtype)


def cross_attention(q, k, v, *, kv_mask: jax.Array | None = None) -> jax.Array:
    """Full cross-attention with key-validity mask. q:(B,Tq,H,D) k/v:(B,Tk,H,D)."""
    mask = None if kv_mask is None else kv_mask[:, None, None, :]
    return mha(q, k, v, mask=mask)
