"""Data-parallel training via shard_map over a `data` mesh axis.

Each replica computes the loss/grads on its batch shard with a
decorrelated sample key (fold_in on axis_index); gradients and scalar
metrics are pmean-reduced over ICI. BatchNorm uses cross-replica
(synced) batch statistics via flax's axis_name, so running stats stay
replica-identical and the replicated output spec is exact.
"""

from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P

from pulpo_tpu.models.api import PULPoModel
from pulpo_tpu.train.step import make_train_step

try:  # jax >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def replicate_state(state, mesh):
    """Place a train state replicated over the mesh.

    Works on a multi-process (pod) mesh too: jax.device_put cannot
    target non-addressable devices, so each process contributes its
    (identical) full value via make_array_from_process_local_data;
    typed PRNG keys are unwrapped to their raw uint32 data for the
    transfer and rewrapped after."""
    import numpy as np
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, P())
    if jax.process_count() == 1:
        return jax.device_put(state, sharding)

    def rep(x):
        if jax.dtypes.issubdtype(getattr(x, "dtype", None), jax.dtypes.prng_key):
            raw = jax.make_array_from_process_local_data(
                sharding, np.asarray(jax.random.key_data(x)))
            return jax.random.wrap_key_data(raw)
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree.map(rep, state)


def make_dp_train_step(model: PULPoModel, tx, mesh):
    """Jitted SPMD train step: state replicated, batch sharded on axis 0.

    The model must have been constructed with bn_axis_name="data" so
    BatchNorm statistics are psum-synced across replicas.
    """
    step = make_train_step(model, tx, axis_name="data")

    batch_spec = P("data")
    smapped = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), batch_spec),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(smapped, donate_argnums=0)
