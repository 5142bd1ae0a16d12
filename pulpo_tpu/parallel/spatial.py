"""Spatial (volume) sharding — the sequence-parallel analog for 3D
registration (SURVEY.md section 2.6: "spatial sharding of volumes").

Volumes are sharded over their depth axis on a `space` mesh axis purely
via sharding annotations: XLA's SPMD partitioner inserts the halo
exchanges for the k=3 convolutions and the collectives for pooling /
resizing / warp gathers automatically, riding ICI. This keeps the model
code unchanged — sharding is a deployment decision, exactly how a
TPU-native framework should express it.

Use `make_2d_mesh(data, space)` + `shard_volume_batch` for inputs and
constrain intermediate activations with `with_spatial_constraint` where
needed. Works combined with data parallelism (mesh axes ('data',
'space')).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_2d_mesh(data: int, space: int, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = data * space
    if n > len(devices):
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(data, space)
    return Mesh(arr, ("data", "space"))


def volume_batch_spec(mesh: Mesh) -> NamedSharding:
    """Batch on 'data', depth axis on 'space': (B, D, H, W, C)."""
    return NamedSharding(mesh, P("data", "space"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def with_spatial_constraint(x, mesh: Mesh):
    """Pin an activation to the (data, space) layout inside jit."""
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P("data", "space")))


def make_spatial_forward(model, mesh: Mesh, deterministic: bool = True):
    """Jitted forward with params replicated and volumes sharded
    (B over 'data', D over 'space')."""
    vspec = volume_batch_spec(mesh)
    rspec = replicated(mesh)

    def fwd(variables, x, y, rng):
        outs = model.module.apply(
            variables, x, y, deterministic=deterministic, train=False,
            rngs=None if deterministic else {"sample": rng},
        )
        return outs[6][0], outs[7][0]  # final df + warped image, level 0

    return jax.jit(
        fwd,
        in_shardings=(rspec, vspec, vspec, rspec),
    )


def make_spatial_train_step(model, tx, mesh: Mesh):
    """Sharded TRAINING step on the (data, space) mesh.

    The full loss + gradient computation runs SPMD with the batch on
    'data' and each volume's depth axis on 'space': XLA's partitioner
    inserts the halo exchanges for the k=3 convs and the collectives for
    the loss reductions / gradient accumulation — the step function
    itself is the ordinary single-device one (train/step.py), unchanged.
    Numerics are identical to the unsharded step (gradient-equality
    test: tests/test_parallel.py::test_spatial_train_step_matches).
    """
    from pulpo_tpu.train.step import make_train_step

    step = make_train_step(model, tx)
    vspec = NamedSharding(mesh, P("data", "space"))
    rspec = NamedSharding(mesh, P())
    vol_ndim = model.cfg.ndims + 2  # (B, *spatial, C)

    def sharded_step(state, batch):
        batch = {
            k: (jax.lax.with_sharding_constraint(v, vspec)
                if hasattr(v, "ndim") and v.ndim == vol_ndim else v)
            for k, v in batch.items()
        }
        return step(state, batch)

    return jax.jit(sharded_step, in_shardings=(rspec, None),
                   donate_argnums=0)
