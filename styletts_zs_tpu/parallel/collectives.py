"""Metadata collectives: length-bucket histogram exchange.

"style-code and length metadata exchanged via collectives"
(``BASELINE.json:5``).  Under pjit/GSPMD the *compute* collectives (grad
psums, TP all-reduces) are inserted automatically from shardings; what needs
explicit code is the *metadata* exchange (SURVEY.md §5.8): every participant
must derive the IDENTICAL global bucket plan so the compiled program
sequence — and therefore the collective schedule — is uniform.

Two named exchanges (``BASELINE.json:5`` "style-code AND length metadata"),
each on two transports:
  - lengths: ``gather_length_histograms`` across a mesh's data axis (ICI,
    ``jax.shard_map`` + ``lax.all_gather``) and ``process_sum_histogram``
    across hosts (DCN, ``multihost_utils.process_allgather``) — feed
    ``bucketing.plan_buckets``.
  - style codes: ``gather_style_codes`` (ICI) and ``process_concat_styles``
    (DCN) — replicate the per-request style table for mixed-speaker batch
    assembly (``pipelines.serve``, ``bucketing.mixed_speaker_order``).
Both degenerate to identity on one shard/process.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from styletts_zs_tpu.parallel.mesh import DATA_AXIS


def length_histogram(lengths: jax.Array, boundaries) -> jax.Array:
    """Counts of ``lengths`` per bucket: bucket i is (b[i-1], b[i]], with
    overflow lengths folded into the LAST bucket — the same contract as
    ``bucketing.bucket_histogram``, so either transport's output feeds
    ``bucketing.plan_buckets`` directly.  jit-safe (static boundary tuple).
    """
    bs = jnp.asarray(tuple(boundaries), jnp.int32)
    idx = jnp.sum(lengths[:, None] > bs[None, :], axis=1)  # (N,) bucket index
    idx = jnp.minimum(idx, len(boundaries) - 1)            # fold overflow
    return jnp.zeros((len(boundaries),), jnp.int32).at[idx].add(1)


def gather_length_histograms(mesh, lengths: jax.Array, boundaries):
    """All-gather per-shard length histograms across the data axis.

    ``lengths``: (N,) int32 sharded (or shardable) over ``data``.  Returns
    (n_data_shards, n_buckets) — identical on every shard, so every
    participant derives the same bucket plan.
    """
    n_data = mesh.shape[DATA_AXIS]

    def shard_fn(ls):
        return jax.lax.all_gather(length_histogram(ls, boundaries), DATA_AXIS)

    out = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh, in_specs=P(DATA_AXIS),
        out_specs=P(DATA_AXIS)))(lengths)
    # out stacks each shard's gathered copy -> (n_data * n_data, n_buckets);
    # every copy is identical, return the first
    return out.reshape(n_data, n_data, -1)[0]


def gather_style_codes(mesh, codes: jax.Array) -> jax.Array:
    """All-gather per-shard style codes / prompt summaries across the data
    axis (ICI) — the second named metadata exchange of ``BASELINE.json:5``
    ("style-code and length metadata exchanged via collectives").

    ``codes``: (N, ...) with N divisible by the data-axis size, sharded (or
    shardable) over ``data`` — e.g. (N, d) prompt-encoder summaries or
    (N, K, d_fsq) FSQ style codes.  Returns the full (N, ...) table,
    identical on every shard, so every participant can assemble the same
    mixed-speaker batches (SURVEY.md §5.8).
    """
    n_data = mesh.shape[DATA_AXIS]

    def shard_fn(c):
        return jax.lax.all_gather(c, DATA_AXIS, tiled=True)

    out = jax.jit(jax.shard_map(
        shard_fn, mesh=mesh, in_specs=P(DATA_AXIS),
        out_specs=P(DATA_AXIS)))(codes)
    # each shard emits the full (N, ...) table; out_specs stacks them to
    # (n_data * N, ...) — every copy is identical, return the first
    return out.reshape(n_data, -1, *out.shape[1:])[0]


def process_concat_styles(local: np.ndarray) -> np.ndarray:
    """Concatenate per-host style tables over DCN (hosts ordered by process
    index) so every host sees the global (N_total, ...) table.  Degenerate
    identity with one process — the DCN twin of ``gather_style_codes``.
    """
    if jax.process_count() <= 1:
        return np.asarray(local)
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(jnp.asarray(local))
    return np.asarray(gathered).reshape(-1, *local.shape[1:])


def process_sum_histogram(local_hist: np.ndarray) -> np.ndarray:
    """Sum per-host histograms over DCN so every host sees the global one.

    Degenerate identity with one process; on a pod this is the
    ``process_allgather`` exchange of SURVEY.md §5.8.
    """
    if jax.process_count() <= 1:
        return np.asarray(local_hist)
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(jnp.asarray(local_hist))
    return np.asarray(gathered).sum(axis=0)


def pmean_grads(grads, axis_name: str = DATA_AXIS):
    """Average gradients across the data axis (inside shard_map/pmap)."""
    return jax.lax.pmean(grads, axis_name)
