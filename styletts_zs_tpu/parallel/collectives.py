"""Collective helpers: gradient psum, metadata all_gather.

"style-code and length metadata exchanged via collectives"
(``BASELINE.json:5``).  Under pjit/GSPMD most collectives are inserted
automatically; these explicit helpers serve the ``shard_map`` training path
and the serving-side bucket-balancing exchange (SURVEY.md §5.8).
"""
from __future__ import annotations

import jax

from styletts_zs_tpu.parallel.mesh import DATA_AXIS


def pmean_grads(grads, axis_name: str = DATA_AXIS):
    """Average gradients across the data axis (inside shard_map/pmap)."""
    return jax.lax.pmean(grads, axis_name)


def all_gather_metadata(x: jax.Array, axis_name: str = DATA_AXIS) -> jax.Array:
    """Gather small per-shard metadata (lengths, bucket histograms) to all."""
    return jax.lax.all_gather(x, axis_name)


def psum_scalar(x: jax.Array, axis_name: str = DATA_AXIS) -> jax.Array:
    return jax.lax.psum(x, axis_name)
