"""Device mesh + data-parallel batch sharding.

The reference is a single-CUDA-device pipeline with Python loops
(SURVEY.md section 2.5); the TPU build's scaling axis is a 1-D device mesh:
pair/image batches are sharded along the batch dimension
(``NamedSharding(P("data"))``), model weights are replicated, and XLA/GSPMD
partitions the jitted programs — matching is embarrassingly parallel, so the
steady-state hot loop has zero cross-chip collectives and all traffic stays
on ICI if a collective is ever inserted.

Host-side batches that don't divide the mesh are padded with duplicated rows
(masked out downstream) so every program instance sees identical shapes.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_DEFAULT_MESH: Optional["MeshRunner"] = None


class MeshRunner:
    def __init__(self, devices: Optional[Sequence] = None, axis: str = "data"):
        if devices is None:
            devices = jax.devices()
        self.devices = list(devices)
        self.axis = axis
        self.mesh = Mesh(np.array(self.devices), (axis,))

    @property
    def n_devices(self) -> int:
        return len(self.devices)

    def batch_sharding(self, ndim: int) -> NamedSharding:
        """Shard the leading (batch) axis; replicate the rest."""
        return NamedSharding(self.mesh, P(self.axis, *([None] * (ndim - 1))))

    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    def shard_array(self, x) -> jax.Array:
        x = np.asarray(x)
        return jax.device_put(x, self.batch_sharding(x.ndim))

    def shard_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, jax.Array]:
        return {k: self.shard_array(v) for k, v in batch.items()}

    def replicate_tree(self, tree):
        return jax.device_put(tree, self.replicated())

    def pad_batch(self, batch: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        """Pad the batch dim up to a multiple of the mesh size by repeating
        the last row. Callers must trim outputs back to the true size."""
        n = next(iter(batch.values())).shape[0]
        target = -(-n // self.n_devices) * self.n_devices
        if target == n:
            return batch
        out = {}
        for k, v in batch.items():
            pad = np.repeat(v[-1:], target - n, axis=0)
            out[k] = np.concatenate([v, pad], axis=0)
        return out


def get_default_mesh() -> MeshRunner:
    global _DEFAULT_MESH
    if _DEFAULT_MESH is None:
        _DEFAULT_MESH = MeshRunner()
    return _DEFAULT_MESH
