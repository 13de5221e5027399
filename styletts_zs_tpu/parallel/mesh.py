"""Device mesh construction: the TPU-native communication backbone.

SURVEY.md §2.4 / §5.8: the equivalent of the reference's (hypothetical) NCCL
backend is XLA collectives over ICI/DCN, reached through a named mesh +
``NamedSharding``.  Axes: ``data`` (utterance batches, the scaling axis per
``BASELINE.json:5``) and ``model`` (tensor-parallel; size 1 = replicated,
used only if the model exceeds one chip's HBM).
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data: int = -1, model: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh. data=-1 uses all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    # Auto axis types: let GSPMD propagate shardings through the whole
    # program (the classic pjit behavior) instead of JAX 0.9's explicit
    # sharding-in-types mode, which demands per-op out_shardings.
    return jax.make_mesh(
        (data, model), (DATA_AXIS, MODEL_AXIS), devices=devices,
        axis_types=(jax.sharding.AxisType.Auto, jax.sharding.AxisType.Auto))


def multihost_init(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None):
    """Multi-host DCN init (pod-scale serving config, ``BASELINE.json:11``).

    Must run BEFORE any jax op on a pod.  Reads ``JAX_COORDINATOR`` if no
    address is given; on a single-process box (no coordinator configured)
    this is the documented degenerate no-op path (SURVEY.md §4.2).
    """
    import os
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR")
    if not addr:
        return False
    jax.distributed.initialize(  # pragma: no cover - needs real pod
        coordinator_address=addr, num_processes=num_processes,
        process_id=process_id)
    return True


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Utterance batches are data-parallel (BASELINE.json:5)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
