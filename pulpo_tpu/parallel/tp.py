"""Mesh-ready parameter-sharding rules (the tensor-parallel hook).

The reference trains single-device (train.py:106-116) and PULPo's
parameter tensors are small (~10-40 MB total), so full Megatron-style
tensor parallelism is out of scope by design (SURVEY.md section 2.6:
"mesh-ready param sharding hooks" is the promised artifact). This
module is that hook: given a params pytree and a mesh with a `model`
axis, it returns a matching pytree of `NamedSharding`s that shards
every output-channel-major tensor over the model axis — conv kernels
(..., cin, cout) and their channel vectors (cout,) — and replicates
the rest. Placing params with these shardings under `jit` makes XLA
partition the matmuls/convs and insert the collectives; nothing in the
model code changes (channels-last activations keep their own sharding
or stay replicated).

Why output channels: channels-last conv kernels contract over cin and
broadcast cout, so a cout shard is a clean column-parallel split —
each device computes a channel slice of the output with no
communication; the all-gather happens lazily only where a consumer
needs the full channel axis. Biases and BN scale/bias/stats ride the
same cout split so the epilogue stays local.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_model_mesh(n_model: int, devices=None) -> Mesh:
    """1D model-axis mesh over the first n_model devices."""
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    if n_model > len(devices):
        raise ValueError(
            f"requested model={n_model} > available {len(devices)} devices")
    return Mesh(np.asarray(devices[:n_model]), ("model",))


def param_sharding_rules(params, mesh: Mesh, axis: str = "model"):
    """Pytree of NamedShardings for `params` over the mesh's model axis.

    Shards the trailing (output-channel) dim of every float tensor
    whose last dim is divisible by the axis size and at least 2x it
    (conv kernels (3,3,3,cin,cout), 1x1 heads, biases, BN vectors);
    everything else — odd channel counts like ndims=3 heads, scalars,
    non-float leaves — is replicated. Pass the whole `variables` dict
    (params + batch_stats): running stats follow their channel split.
    """
    n = mesh.shape[axis]

    def rule(x):
        shape = getattr(x, "shape", ())
        dtype = getattr(x, "dtype", None)
        if (dtype is not None and jax.dtypes.issubdtype(dtype, jax.numpy.floating)
                and len(shape) >= 1 and shape[-1] >= 2 * n
                and shape[-1] % n == 0):
            spec = [None] * (len(shape) - 1) + [axis]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)


def shard_params(params, mesh: Mesh, axis: str = "model"):
    """device_put `params` with `param_sharding_rules` shardings."""
    return jax.device_put(params, param_sharding_rules(params, mesh, axis))
