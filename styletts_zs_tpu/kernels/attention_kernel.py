"""Pallas TPU attention kernels: chunk-local (windowed) and full attention.

The mandated hot path for decoder/diffusion attention (``BASELINE.json:5``
"attention/conv decoder blocks ... hand-written Pallas"; chunked attention for
60 s long-form per ``BASELINE.json:10``).  Semantics match the XLA twins in
``styletts_zs_tpu/ops/attention.py`` exactly (allclose-gated in tests):
queries in chunk c attend to keys in chunks c-1, c, c+1.

Design notes (per /opt/skills/guides/pallas_guide.md):
- grid (B, H, n_chunks); K/V block specs are grid-invariant along the chunk
  axis so Mosaic keeps them resident in VMEM across chunk iterations.
- The 3-chunk key window is a static-size ``pl.ds`` slice with the start
  clamped into range; band validity is re-imposed with an index mask, so the
  clamp never changes semantics.
- Scores/softmax in fp32 on the VPU; both matmuls hit the MXU with
  ``preferred_element_type=float32``.
- On CPU (tests / golden path comparisons) kernels run in interpret mode.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _local_attn_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, *, chunk: int,
                       t_total: int, scale: float):
    b = pl.program_id(0)
    i = pl.program_id(2)
    c = chunk
    # window start is a multiple of the chunk size (clip endpoints are too)
    s0 = pl.multiple_of(jnp.clip((i - 1) * c, 0, t_total - 3 * c), c)

    q = q_ref[0, 0, :, :]                       # (c, D)
    k = k_ref[0, 0, pl.ds(s0, 3 * c), :]        # (3c, D)
    v = v_ref[0, 0, pl.ds(s0, 3 * c), :]

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale   # (c, 3c)

    key_abs = s0 + jax.lax.broadcasted_iota(jnp.int32, (1, 3 * c), 1)
    band = (key_abs >= (i - 1) * c) & (key_abs < (i + 2) * c)
    valid = band & (key_abs < len_ref[b])
    scores = jnp.where(valid, scores, NEG_INF)

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    probs = e / jnp.maximum(denom, 1e-30)

    out = jax.lax.dot_general(
        probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0, 0, :, :] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _local_attention_impl(q, k, v, lengths, *, chunk: int):
    B, H, T, D = q.shape
    n = T // chunk
    grid = (B, H, n)
    kernel = functools.partial(_local_attn_kernel, chunk=chunk, t_total=T,
                               scale=D ** -0.5)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, chunk, D), lambda b, h, i, *_: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T, D), lambda b, h, i, *_: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T, D), lambda b, h, i, *_: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, chunk, D),
                               lambda b, h, i, *_: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
        interpret=_interpret(),
    )(lengths, q, k, v)


def local_attention_pallas(q, k, v, *, chunk: int, kv_mask=None):
    """(B, T, H, D) chunk-local attention; Pallas twin of ops.attention.

    ``kv_mask`` is interpreted as a contiguous length mask (every mask in
    this framework is one): the kernel keeps key t iff t < sum(mask).
    """
    B, T, H, D = q.shape
    if T % chunk != 0 or T < 3 * chunk or chunk % 8 != 0:
        # degenerate sizes: the XLA twin is already optimal
        from styletts_zs_tpu.ops import attention as attn_ops
        return attn_ops.local_attention(q, k, v, chunk=chunk, kv_mask=kv_mask)
    if kv_mask is None:
        lengths = jnp.full((B,), T, jnp.int32)
    else:
        lengths = jnp.sum(kv_mask.astype(jnp.int32), axis=-1)
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    out = _local_attention_impl(qt, kt, vt, lengths, chunk=chunk)
    return jnp.transpose(out, (0, 2, 1, 3))


# ---------------------------------------------------------------------------
# full attention (cross-attention over short contexts; self-attention)
# ---------------------------------------------------------------------------

def _full_attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float):
    q = q_ref[0, 0, :, :]          # (Tq_blk, D)
    k = k_ref[0, 0, :, :]          # (Tk, D)
    v = v_ref[0, 0, :, :]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    valid = mask_ref[0, 0, :][None, :] > 0
    scores = jnp.where(valid, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    out = jax.lax.dot_general(
        probs.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0, 0, :, :] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("q_block",))
def _full_attention_impl(q, k, v, mask, *, q_block: int):
    B, H, Tq, D = q.shape
    Tk = k.shape[2]
    grid = (B, H, Tq // q_block)
    kernel = functools.partial(_full_attn_kernel, scale=D ** -0.5)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, q_block, D), lambda b, h, i: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tk, D), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tk, D), lambda b, h, i: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tk), lambda b, h, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, q_block, D), lambda b, h, i: (b, h, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Tq, D), q.dtype),
        interpret=_interpret(),
    )(q, k, v, mask)


def full_attention_pallas(q, k, v, *, kv_mask=None):
    """(B, Tq, H, D) x (B, Tk, H, D) full attention; Pallas twin."""
    B, Tq, H, D = q.shape
    Tk = k.shape[1]
    q_block = 128 if Tq % 128 == 0 else (Tq if Tq <= 512 else None)
    # VMEM guard: the kernel holds full K/V plus (q_block, Tk) fp32 score
    # tiles per block — fine for the short contexts it serves (prompt
    # tokens, style codes, text cross-attention), but a long-form caller
    # must go through chunk-local attention; past this bound the XLA twin
    # is the safe path rather than a Mosaic VMEM OOM.
    if Tk > 2048:
        q_block = None
    if q_block is None:
        from styletts_zs_tpu.ops import attention as attn_ops
        return attn_ops.cross_attention(q, k, v, kv_mask=kv_mask)
    if kv_mask is None:
        mask = jnp.ones((B, 1, Tk), jnp.int32)
    else:
        mask = kv_mask.astype(jnp.int32)[:, None, :]
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    out = _full_attention_impl(qt, kt, vt, mask, q_block=q_block)
    return jnp.transpose(out, (0, 2, 1, 3))

# ---------------------------------------------------------------------------
# chunk-local attention: dedicated backward kernels (flash-attention style)
# ---------------------------------------------------------------------------
#
# The custom VJP in kernels/dispatch.py routes here when chunk % 128 == 0
# (lane-aligned dynamic slices); otherwise it falls back to differentiating
# the XLA twin.  Forward saves the per-query log-sum-exp; backward recomputes
# probabilities from it (no (T, 3c) residuals in HBM):
#   p    = exp(s_masked - lse)
#   dV_j = sum_i p^T g           dS = p * (g v^T - delta),  delta = g.out
#   dQ_i = scale * dS K_w        dK_j = scale * sum_i dS^T q_i


def _local_attn_fwd_lse_kernel(len_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                               *, chunk: int, t_total: int, scale: float):
    b = pl.program_id(0)
    i = pl.program_id(2)
    c = chunk
    s0 = pl.multiple_of(jnp.clip((i - 1) * c, 0, t_total - 3 * c), c)

    q = q_ref[0, 0, :, :]
    k = k_ref[0, 0, pl.ds(s0, 3 * c), :]
    v = v_ref[0, 0, pl.ds(s0, 3 * c), :]
    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    key_abs = s0 + jax.lax.broadcasted_iota(jnp.int32, (1, 3 * c), 1)
    band = (key_abs >= (i - 1) * c) & (key_abs < (i + 2) * c)
    valid = band & (key_abs < len_ref[b])
    scores = jnp.where(valid, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    out = jax.lax.dot_general(
        (e / denom).astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0, 0, :, :] = out.astype(o_ref.dtype)
    lse = (m + jnp.log(denom))[:, 0]                      # (c,)
    lse_ref[0, 0, 0:1, pl.ds(i * c, c)] = lse[None, :]


@functools.partial(jax.jit, static_argnames=("chunk",))
def _local_attention_fwd_lse_impl(q, k, v, lengths, *, chunk: int):
    B, H, T, D = q.shape
    n = T // chunk
    kernel = functools.partial(_local_attn_fwd_lse_kernel, chunk=chunk,
                               t_total=T, scale=D ** -0.5)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H, n),
        in_specs=[
            pl.BlockSpec((1, 1, chunk, D), lambda b, h, i, *_: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T, D), lambda b, h, i, *_: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, T, D), lambda b, h, i, *_: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, chunk, D), lambda b, h, i, *_: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            # (B, H, 1, T): the singleton axis keeps the last-two block dims
            # (1, T) equal to the array dims (TPU block-shape rule)
            pl.BlockSpec((1, 1, 1, T), lambda b, h, i, *_: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
                   jax.ShapeDtypeStruct((B, H, 1, T), jnp.float32)),
        interpret=_interpret(),
    )(lengths, q, k, v)


def _local_attn_bwd_dq_kernel(len_ref, q_ref, k_ref, v_ref, g_ref, lse_ref,
                              delta_ref, dq_ref, *, chunk: int, t_total: int,
                              scale: float):
    b = pl.program_id(0)
    i = pl.program_id(2)
    c = chunk
    s0 = pl.multiple_of(jnp.clip((i - 1) * c, 0, t_total - 3 * c), c)

    q = q_ref[0, 0, :, :]
    k = k_ref[0, 0, pl.ds(s0, 3 * c), :]
    v = v_ref[0, 0, pl.ds(s0, 3 * c), :]
    g = g_ref[0, 0, :, :]
    lse = lse_ref[0, 0, 0:1, pl.ds(i * c, c)]             # (1, c)
    delta = delta_ref[0, 0, 0:1, pl.ds(i * c, c)]

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    key_abs = s0 + jax.lax.broadcasted_iota(jnp.int32, (1, 3 * c), 1)
    band = (key_abs >= (i - 1) * c) & (key_abs < (i + 2) * c)
    valid = band & (key_abs < len_ref[b])
    scores = jnp.where(valid, scores, NEG_INF)
    p = jnp.exp(scores - lse.T)                           # (c, 3c)
    dp = jax.lax.dot_general(
        g, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # (c, 3c)
    ds = p * (dp - delta.T)
    dq = jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    dq_ref[0, 0, :, :] = dq.astype(dq_ref.dtype)


def _local_attn_bwd_dkv_kernel(len_ref, q_ref, k_ref, v_ref, g_ref, lse_ref,
                               delta_ref, dk_ref, dv_ref, *, chunk: int,
                               t_total: int, scale: float):
    b = pl.program_id(0)
    j = pl.program_id(2)
    c = chunk
    n = t_total // c
    kj = k_ref[0, 0, :, :]                                # (c, D) key chunk j
    vj = v_ref[0, 0, :, :]                                # (c, D)
    key_abs = j * c + jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
    key_valid = key_abs < len_ref[b]

    dk = jnp.zeros((c, kj.shape[-1]), jnp.float32)
    dv = jnp.zeros((c, kj.shape[-1]), jnp.float32)
    for delta_i in (-1, 0, 1):
        iq = j + delta_i
        ok = jnp.logical_and(iq >= 0, iq < n)
        iq_c = jnp.clip(iq, 0, n - 1)
        qs = pl.multiple_of(iq_c * c, c)
        q_i = q_ref[0, 0, pl.ds(qs, c), :]                # (c, D)
        g_i = g_ref[0, 0, pl.ds(qs, c), :]
        lse_i = lse_ref[0, 0, 0:1, pl.ds(qs, c)]          # (1, c)
        del_i = delta_ref[0, 0, 0:1, pl.ds(qs, c)]
        s_ij = jax.lax.dot_general(
            q_i, kj, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # (c_q, c_k)
        s_ij = jnp.where(key_valid, s_ij, NEG_INF)
        p = jnp.exp(s_ij - lse_i.T)
        dp = jax.lax.dot_general(
            g_i, vj, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # (c_q, c_k)
        ds = p * (dp - del_i.T)
        w = jnp.where(ok, 1.0, 0.0)
        dk += w * jax.lax.dot_general(
            ds.astype(q_i.dtype), q_i, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        dv += w * jax.lax.dot_general(
            p.astype(g_i.dtype), g_i, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    dk_ref[0, 0, :, :] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0, :, :] = dv.astype(dv_ref.dtype)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _local_attention_bwd_impl(q, k, v, g, lse, delta, lengths, *, chunk: int):
    B, H, T, D = q.shape
    n = T // chunk
    full = pl.BlockSpec((1, 1, T, D), lambda b, h, i, *_: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)
    chunked = pl.BlockSpec((1, 1, chunk, D), lambda b, h, i, *_: (b, h, i, 0),
                           memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, 1, 1, T), lambda b, h, i, *_: (b, h, 0, 0),
                       memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_local_attn_bwd_dq_kernel, chunk=chunk, t_total=T,
                          scale=D ** -0.5),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(B, H, n),
            in_specs=[chunked, full, full, chunked, row, row],
            out_specs=chunked),
        out_shape=jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
        interpret=_interpret(),
    )(lengths, q, k, v, g, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_local_attn_bwd_dkv_kernel, chunk=chunk, t_total=T,
                          scale=D ** -0.5),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(B, H, n),
            in_specs=[full, chunked, chunked, full, row, row],
            out_specs=(chunked, chunked)),
        out_shape=(jax.ShapeDtypeStruct((B, H, T, D), k.dtype),
                   jax.ShapeDtypeStruct((B, H, T, D), v.dtype)),
        interpret=_interpret(),
    )(lengths, q, k, v, g, lse, delta)
    return dq, dk, dv


def local_attention_fwd_pallas(q, k, v, *, chunk: int, kv_mask=None):
    """Forward returning (out, residuals) for the Pallas backward."""
    B, T, H, D = q.shape
    if kv_mask is None:
        lengths = jnp.full((B,), T, jnp.int32)
    else:
        lengths = jnp.sum(kv_mask.astype(jnp.int32), axis=-1)
    qt = jnp.transpose(q, (0, 2, 1, 3))
    kt = jnp.transpose(k, (0, 2, 1, 3))
    vt = jnp.transpose(v, (0, 2, 1, 3))
    out_t, lse = _local_attention_fwd_lse_impl(qt, kt, vt, lengths,
                                               chunk=chunk)
    return jnp.transpose(out_t, (0, 2, 1, 3)), (qt, kt, vt, out_t, lse,
                                                lengths)


def local_attention_bwd_pallas(residuals, g, *, chunk: int):
    """g: (B, T, H, D) cotangent -> (dq, dk, dv) in (B, T, H, D)."""
    qt, kt, vt, out_t, lse, lengths = residuals
    gt = jnp.transpose(g, (0, 2, 1, 3))
    delta = jnp.sum(gt.astype(jnp.float32) * out_t.astype(jnp.float32),
                    axis=-1)[:, :, None, :]               # (B, H, 1, T)
    dq, dk, dv = _local_attention_bwd_impl(qt, kt, vt, gt, lse, delta,
                                           lengths, chunk=chunk)
    tr = lambda x: jnp.transpose(x, (0, 2, 1, 3))  # noqa: E731
    return tr(dq), tr(dk), tr(dv)
