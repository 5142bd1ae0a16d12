"""Network building blocks (flax linen, channels-last).

Mirrors the reference block zoo (src/network_blocks.py:11-85):
ConvUnit = Conv(k=3, SAME) -> BatchNorm -> LeakyReLU(0.2); ConvSequence;
MuSigmaBlock (1x1 convs, Softplus sigma); VelocityField decoder head.

Initialization follows torch's Conv defaults (kaiming_uniform(a=sqrt(5))
== U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both kernel and bias) so
training dynamics match the reference distributionally.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# torch kaiming_uniform(a=sqrt(5)): U(-b, b), b = 1/sqrt(fan_in)
# == variance_scaling(scale=1/3, fan_in, uniform).
torch_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int) -> Callable:
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchConv(nn.Module):
    """nn.Conv with torch-style kernel/bias initialization."""

    features: int
    kernel_size: int = 3
    padding: str | int = "SAME"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        ndims = x.ndim - 2
        fan_in = x.shape[-1] * self.kernel_size**ndims
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad)] * ndims
        return nn.Conv(
            self.features,
            kernel_size=(self.kernel_size,) * ndims,
            padding=pad,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
            dtype=self.dtype,
        )(x)


class ConvUnit(nn.Module):
    """Conv(k=3, pad=1) -> BatchNorm -> LeakyReLU(0.2)
    (network_blocks.py:11-29)."""

    features: int
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None  # set to sync batch stats across DP replicas

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = TorchConv(self.features, 3, "SAME", dtype=self.dtype)(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,  # torch momentum=0.1 -> running = 0.9*run + 0.1*batch
            epsilon=1e-5,
            dtype=self.dtype,
            axis_name=self.bn_axis_name if train else None,
        )(x)
        return nn.leaky_relu(x, negative_slope=0.2)


class ConvSequence(nn.Module):
    """`depth` chained ConvUnits; the first changes the channel count
    (network_blocks.py:32-46)."""

    features: int
    depth: int
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        for _ in range(self.depth):
            x = ConvUnit(self.features, self.dtype, self.bn_axis_name)(x, train)
        return x


class MuSigmaBlock(nn.Module):
    """Two 1x1 convs: linear mu head and Softplus sigma head
    (network_blocks.py:49-60)."""

    zdim: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        mu = TorchConv(self.zdim, 1, "SAME", dtype=self.dtype, name="conv_mu")(x)
        sigma = TorchConv(self.zdim, 1, "SAME", dtype=self.dtype, name="conv_sigma")(x)
        return mu, jax.nn.softplus(sigma)


class VelocityField(nn.Module):
    """Latent sample -> stationary velocity field (network_blocks.py:63-85).

    depth >= 2: ConvUnit(z->n0) + (depth-2) ConvUnits + 1x1 Conv(n0->ndims).
    depth == 1: a single unpadded k=3 conv (shape-shrinking; the reference
    keeps this likely-unused path and so do we). depth == 0: identity.
    """

    ndims: int
    max_channels: int  # n0
    depth: int
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, z, train: bool = True):
        if self.depth == 0:
            return z
        if self.depth == 1:
            return TorchConv(self.ndims, 3, "VALID", dtype=self.dtype)(z)
        x = ConvUnit(self.max_channels, self.dtype, self.bn_axis_name)(z, train)
        for _ in range(self.depth - 2):
            x = ConvUnit(self.max_channels, self.dtype, self.bn_axis_name)(x, train)
        return TorchConv(self.ndims, 1, "SAME", dtype=self.dtype)(x)
