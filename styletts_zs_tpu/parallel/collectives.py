"""Metadata collectives: length-bucket histogram exchange.

"style-code and length metadata exchanged via collectives"
(``BASELINE.json:5``).  Under pjit/GSPMD the *compute* collectives (grad
psums, TP all-reduces) are inserted automatically from shardings; what needs
explicit code is the *metadata* exchange (SURVEY.md §5.8): every participant
must derive the IDENTICAL global bucket plan so the compiled program
sequence — and therefore the collective schedule — is uniform.

Two transports, same contract:
  - ``gather_length_histograms``: across a mesh's data axis (ICI), via
    ``jax.shard_map`` + ``lax.all_gather`` — used by the sharded serving /
    training paths and exercised in tests + ``__graft_entry__``.
  - ``process_sum_histogram``: across hosts (DCN), via
    ``multihost_utils.process_allgather`` — used by ``pipelines.serve`` on a
    pod; degenerates to identity on one process.
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
