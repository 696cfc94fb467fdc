"""Device mesh and sharding layer.

The reference is strictly single-process / single-GPU with hardcoded
CUDA_VISIBLE_DEVICES (train.py:23, test.py:24, decode.py:24; SURVEY.md
section 2 "Parallelism inventory").  The TPU-native replacement is a
jax.sharding.Mesh over all devices with a ('data', 'model') layout:

- batch dims sharded over 'data' (DP); gradients are reduced by XLA's
  psum over ICI — no explicit collectives in user code.
- 'model' axis reserved for tensor-parallel layouts of the projection /
  attention matrices (the LAS model is small enough that DP alone covers
  the reference's scale; the axis exists so TP can be enabled without
  restructuring).

All entry points call `shard_batch` / `replicate` so the same code runs
on 1 chip, an 8-device CPU simulation, or a pod slice.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, num_partitions: int = 1,
              data_axis: str = "data", model_axis: str = "model") -> Mesh:
    """Build a 2-D ('data', 'model') mesh over the first num_devices."""
    devs = jax.devices()
    n = num_devices or len(devs)
    devs = devs[:n]
    if n % num_partitions:
        raise ValueError(f"{n} devices not divisible by {num_partitions} partitions")
    arr = np.array(devs).reshape(n // num_partitions, num_partitions)
    return Mesh(arr, (data_axis, model_axis))


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
