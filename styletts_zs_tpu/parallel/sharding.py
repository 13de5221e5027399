"""Parameter sharding rules (GSPMD tensor parallelism).

``BASELINE.json:5``: "model replicated (sharded only if it exceeds one
chip)".  The default rule therefore replicates everything; when the ``model``
mesh axis is >1, large 2-D kernels are sharded on their output dimension and
XLA/GSPMD inserts the all-gathers/reduce-scatters over ICI — the TPU-idiomatic
tensor parallelism (no hand-written TP kernels, SURVEY.md §2.4).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from styletts_zs_tpu.parallel.mesh import MODEL_AXIS


def param_shardings(params, mesh: Mesh, *, min_shard_dim: int = 256):
    """Pytree of NamedShardings for a param tree.

    Rule: if the mesh's model axis has size m > 1 and a kernel's last dim is
    divisible by m*128 (keeps lane tiling intact), shard that dim; otherwise
    replicate.  Biases/norm scales always replicate.
    """
    m = mesh.shape[MODEL_AXIS]

    def rule(p):
        if (m > 1 and p.ndim >= 2 and p.shape[-1] >= min_shard_dim
                and p.shape[-1] % (m * 128) == 0):
            spec = [None] * (p.ndim - 1) + [MODEL_AXIS]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)


def shard_params(params, shardings):
    """Place a host param tree onto the mesh per the sharding tree."""
    return jax.tree.map(jax.device_put, params, shardings)


def estimate_bytes(params) -> int:
    return sum(int(np.prod(p.shape)) * p.dtype.itemsize
               for p in jax.tree.leaves(params))
