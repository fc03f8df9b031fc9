"""Device mesh + sharding helpers.

The reference's parallelism is nn.DataParallel (train_effocr_recognizer.py:288-293)
and Detectron2 DDP/NCCL (train_effocr_localizer_d2.py:258-265).  The TPU-native
equivalent is a ``jax.sharding.Mesh`` with named axes and jit shardings: the
batch is sharded over the ``data`` axis, params are replicated (or sharded over
``model`` for tensor parallelism), and XLA inserts all-reduce collectives over
ICI/DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Build a 2D ('data', 'model') mesh.

    ``model=1`` by default: the reference models are small (<=30M params), so
    data parallelism is the primary strategy; the model axis exists so tensor
    parallelism is a config change, not a rewrite.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard leading (batch) axis over the data axis; rest replicated."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of arrays with the leading axis sharded over data."""

    def _put(x):
        return jax.device_put(x, data_sharding(mesh, np.ndim(x)))

    return jax.tree_util.tree_map(_put, batch)


def pad_batch_to_data_axis(batch_size: int, mesh: Mesh) -> int:
    """Smallest batch size >= batch_size divisible by the data axis."""
    d = mesh.shape[DATA_AXIS]
    return ((batch_size + d - 1) // d) * d
