"""Device mesh + sharding rules for FCN training.

The reference's only distributed machinery is nn.DataParallel + a vendored
synchronized-BatchNorm library (train_modular.py:305-315,
lib/nn/modules/{batchnorm,comm,replicate}.py — SURVEY.md §2e row 6). Under
XLA's GSPMD that entire subsystem reduces to: a ('dp', 'mp') mesh, batch
sharded over dp, wide conv kernels sharded over mp, and BatchNorm written
as plain global-batch statistics — the compiler inserts the cross-replica
psums (sync-BN) and weight all-gathers on ICI automatically.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, mp: Optional[int] = None) -> Mesh:
    devices = jax.devices()[: n_devices or len(jax.devices())]
    n = len(devices)
    if mp is None:
        mp = 2 if n % 2 == 0 and n >= 4 else 1
    dp = n // mp
    return Mesh(np.asarray(devices[: dp * mp]).reshape(dp, mp), ("dp", "mp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp"))


def param_spec(path_tuple, arr) -> P:
    """Shard wide conv kernels over 'mp' (output channels), replicate the
    rest. Conv kernels are HWIO; BN scales/biases stay replicated."""
    if arr.ndim == 4 and arr.shape[-1] >= 64:
        return P(None, None, None, "mp")
    return P()


def shard_params(params, mesh: Mesh):
    def place(path, arr):
        return jax.device_put(arr, NamedSharding(mesh, param_spec(path, arr)))

    return jax.tree_util.tree_map_with_path(place, params)
