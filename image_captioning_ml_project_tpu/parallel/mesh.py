"""Device mesh construction and sharding rules.

The reference is single-device (``model.to(device)``, README.md:148-149); the
TPU rebuild's primary parallelism is **data parallelism over the ICI mesh**
(SURVEY.md §2.3): parameters replicated, batches sharded on the ``data``
axis, gradients all-reduced by XLA-inserted ``psum``s — all derived
automatically by jit from the shardings set up here. A ``model`` axis is
reserved for tensor-parallel layouts (e.g. GPT-2-774M decoders).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import MeshConfig


def create_mesh(mesh_config: Optional[MeshConfig] = None,
                devices=None) -> Mesh:
    """Build a (data, model) mesh over the available devices. ``-1`` axis
    sizes absorb all remaining devices."""
    mesh_config = mesh_config or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    dp, mp = mesh_config.data_parallel, mesh_config.model_parallel
    if dp <= 0 and mp <= 0:
        dp, mp = n, 1
    elif mp <= 0:  # -1: model axis absorbs the devices data doesn't take
        mp = n // dp
    elif dp <= 0:
        dp = n // mp
    assert dp * mp == n, (
        f"mesh {dp}x{mp} does not cover {n} devices")
    arr = np.asarray(devices).reshape(dp, mp)
    return Mesh(arr, (mesh_config.data_axis, mesh_config.model_axis))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (parameters under pure data parallelism)."""
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1,
                   data_axis: str = "data") -> NamedSharding:
    """Batch-axis sharding for an array of ``ndim`` dims."""
    return NamedSharding(mesh, P(data_axis, *([None] * (ndim - 1))))


def replicate(tree, mesh: Mesh):
    """Device-put a pytree fully replicated over the mesh."""
    sharding = replicate_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)
