"""Device mesh + sharding helpers.

The reference's only real distribution strategy is PyTorch-DDP data
parallelism in the vendored DINO pre-training (SURVEY.md section 2.2); the
SAIS path itself runs single-process with dead DDP scaffolding.  Here
distribution is first-class: a `jax.sharding.Mesh` with a data axis (and an
optional model axis for larger encoders), batch arrays sharded on the data
axis, parameters replicated, and XLA inserting the gradient all-reduce over
ICI — the jit-native equivalent of DDP + NCCL allreduce.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sais_tpu.config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(cfg: MeshConfig = MeshConfig(),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = max(cfg.model_parallel, 1)
    data = cfg.data_parallel if cfg.data_parallel > 0 else n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis — jointly with
    the DCN (inter-slice) axis on multislice meshes, so every slice owns a
    contiguous shard and gradient reductions run hierarchically."""
    from sais_tpu.parallel.distributed import DCN_AXIS
    if DCN_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P((DCN_AXIS, DATA_AXIS)))
    return NamedSharding(mesh, P(DATA_AXIS))


def data_parallel_size(mesh: Mesh) -> int:
    """Number of data-parallel shards (incl. the DCN axis when present)."""
    from sais_tpu.parallel.distributed import DCN_AXIS
    n = mesh.shape[DATA_AXIS]
    if DCN_AXIS in mesh.axis_names:
        n *= mesh.shape[DCN_AXIS]
    return n


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-put every array in a batch pytree with its leading axis split
    across the data axis of the mesh."""
    sh = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sh = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(batch: Any, multiple: int) -> Any:
    """Pad leading axes up to a multiple of the data-axis size so shapes
    divide evenly across devices (host-side, numpy)."""

    def _pad(x):
        n = x.shape[0]
        rem = (-n) % multiple
        if rem == 0:
            return x
        pad_width = [(0, rem)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(np.asarray(x), pad_width)

    return jax.tree.map(_pad, batch)


def pad_batch_with_weight(batch: dict, multiple: int) -> dict:
    """Pad a batch dict to a divisible leading size and attach a 'weight'
    array (1.0 for real rows, 0.0 for padding) so losses can mask the
    padded rows out."""
    n = next(iter(batch.values())).shape[0]
    weight = batch.get("weight")
    if weight is None:
        weight = np.ones((n,), np.float32)
    out = dict(batch)
    out["weight"] = weight
    return pad_to_multiple(out, multiple)
