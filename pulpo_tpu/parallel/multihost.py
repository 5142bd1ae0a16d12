"""Multi-host (pod-scale) scaffolding: jax.distributed + per-process data.

BASELINE config 5 is data-parallel OASIS training on a v5e-32 pod: 4+
hosts, each driving its local chips. The JAX runtime model is SPMD — the
same program runs on every process over the *global* device set; each
process feeds only its local shard of the batch. This module wires that
up without changing any model/trainer code:

  initialize()            — jax.distributed.initialize (no-op single-host)
  make_global_mesh(n)     — ('data',)-mesh over global devices
  process_shard(n)        — which batch rows this process owns
  local_to_global(batch)  — host-local numpy -> globally-sharded jax.Array
                            (jax.make_array_from_process_local_data)

Single-process test story: everything below degenerates gracefully with
process_count == 1 (tests/test_parallel.py runs it on the 8-device CPU
mesh); the driver's dryrun_multichip exercises the same path.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Initialize jax.distributed from args or env (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID). Returns True if a multi-process
    runtime was started; single-host runs are a no-op."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=(num_processes if num_processes is not None
                       else int(os.environ.get("JAX_NUM_PROCESSES", "1"))),
        process_id=(process_id if process_id is not None
                    else int(os.environ.get("JAX_PROCESS_ID", "0"))),
    )
    return True


def make_global_mesh(data: int | None = None, axis: str = "data") -> Mesh:
    """1D mesh over the *global* device list (all processes)."""
    devices = jax.devices()
    n = data if data is not None else len(devices)
    if n > len(devices):
        raise ValueError(f"need {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]), (axis,))


def process_shard(global_batch: int) -> slice:
    """The contiguous row range of the global batch this process feeds.
    Requires the per-process share to be equal (global_batch divisible
    by process_count) — the standard SPMD data contract."""
    pc = jax.process_count()
    if global_batch % pc:
        raise ValueError(
            f"global batch {global_batch} not divisible by {pc} processes")
    per = global_batch // pc
    pi = jax.process_index()
    return slice(pi * per, (pi + 1) * per)


def shard_dataset_indices(n_items: int, seed: int, epoch: int,
                          global_batch: int) -> np.ndarray:
    """Deterministic per-epoch permutation, restricted to this process's
    rows of each global batch — every process draws the same permutation
    (same seed/epoch) and picks disjoint slices, so the global batch is
    exactly a shuffle without duplication."""
    rng = np.random.default_rng((seed, epoch))
    perm = rng.permutation(n_items)
    n_batches = n_items // global_batch
    perm = perm[: n_batches * global_batch].reshape(n_batches, global_batch)
    return perm[:, process_shard(global_batch)]


def local_to_global(local_batch, mesh: Mesh, spec: P = P("data")):
    """Assemble host-local arrays into globally-sharded jax.Arrays.

    local_batch: pytree of numpy arrays with the *per-process* batch on
    axis 0. The result's global shape has batch = local * process_count.
    """
    sharding = NamedSharding(mesh, spec)

    def convert(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(
            sharding, x, global_shape)

    return jax.tree.map(convert, local_batch)
