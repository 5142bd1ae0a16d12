"""Device mesh construction for data-parallel (and future spatial)
sharding.

The reference is strictly single-process single-device
(train.py:106-116); parallelism here is a new first-class TPU-native
subsystem: a `jax.sharding.Mesh` with a `data` axis, XLA collectives
over ICI, per-replica RNG folding. See SURVEY.md section 2.6.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, devices=None) -> Mesh:
    """1D data-parallel mesh over the first n_data devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices)
    if n_data > len(devices):
        raise ValueError(f"requested data={n_data} > available {len(devices)} devices")
    return Mesh(np.asarray(devices[:n_data]), ("data",))


def shard_batch_spec(mesh: Mesh) -> NamedSharding:
    """Batch leaves are sharded along the leading (batch) axis."""
    return NamedSharding(mesh, P("data"))


def replicated_spec(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
