"""Device-mesh construction.

TPU-native replacement for the reference's DDP topology (one NCCL process
per GPU, reference minigpt4/common/dist_utils.py + runner DDP wrap): a
single ``jax.sharding.Mesh`` with a ``data`` axis (batch parallel, the only
parallelism the reference has) and a ``model`` axis (GSPMD tensor sharding
for the 7B LLM — the addition the TPU target requires, SURVEY.md §2.9).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_model: Optional[int] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data','model') mesh over all (or given) devices.

    ``n_model`` defaults to 1 (pure data parallel).  The model axis is laid
    out innermost so tensor-parallel collectives ride neighbouring ICI
    links.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    n_model = n_model or 1
    if n % n_model != 0:
        raise ValueError(f"{n} devices not divisible by model axis {n_model}")
    arr = np.asarray(devices).reshape(n // n_model, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def put_sharded(x, sharding: NamedSharding):
    """Place one host array under ``sharding``, multi-host aware.

    Single process: plain ``device_put``.  Multi-process (pod scale): the
    host holds only its PROCESS-LOCAL rows (DistributedSampler shard), so
    the global array is assembled with
    ``jax.make_array_from_process_local_data`` — the JAX equivalent of the
    reference's DDP per-rank batches (reference runner_base.py:533-544).
    """
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))
    return jax.device_put(x, sharding)


def shard_batch(batch, mesh: Mesh):
    """Place a host batch with the batch dim sharded over 'data'.

    In multi-process jobs ``batch`` is the process-local shard (global
    batch = local batch × process count)."""
    return jax.tree_util.tree_map(
        lambda x: put_sharded(x, data_sharding(mesh, np.ndim(x) or 1)), batch
    )
