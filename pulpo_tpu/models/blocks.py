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


class _RawConv(nn.Module):
    """Channels-last conv with nn.Conv-compatible parameters
    ((*window, in, out) kernel + (out,) bias under the same names), but
    with an optional SPLIT application: ``__call__(x, x2)`` computes
    ``conv(concat([x, x2], -1))`` as ``conv_a(x) + conv_b(x2)`` using
    slices of the ONE kernel — mathematically identical (convolution is
    linear in channels) without ever materializing the concat (the
    measured v5e HBM breakdown showed an 11.25G concat+layout-copy for
    the level-0 merge conv input, PERF.md).

    If ``x2`` has a smaller batch (B) than ``x`` (S*B, samples folded
    into the batch axis), its half is convolved ONCE per pair and
    broadcast across the S samples — the per-pair dedupe of the
    feedback-merge activation half (reference pulpo.py:235-240 pays it
    per sample).

    Scan-hoisting of the per-pair half (uq/predict streams sample
    chunks through a lax.scan, which would otherwise re-convolve the
    pair-constant half every chunk):

    - ``act_half=True``: ``x`` is the x2 operand; returns the raw
      ``conv_b(x)`` (no bias). ``x2_features`` must give the width of
      the ABSENT first half so the kernel parameter keeps its full
      concat shape.
    - ``y2=<precomputed>``: skips ``conv_b`` and adds the hoisted
      result instead — bit-identical to the unhoisted split call.
    """

    features: int
    kernel_size: int = 3
    padding: str | int = "SAME"
    dtype: jnp.dtype | None = None

    def _conv(self, x, kernel):
        ndims = x.ndim - 2
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad)] * ndims
        # large-volume 3x3x3 convs: hand-written tap-sum backward (XLA's
        # conv-backward layouts 4x-pad full-res temps -> train-step OOM;
        # ops/conv.py). Forward path is identical.
        from pulpo_tpu import routing as _routing
        from pulpo_tpu.ops.conv import conv3d_tapgrad, use_tapgrad

        if use_tapgrad(x, self.kernel_size, self.padding):
            return conv3d_tapgrad(x, kernel)
        # narrow-cin convs (the VelocityField head's z->n0) stay on the
        # XLA VPU path: the single-op MXU fix was 1.8x isolated but
        # -2.9% composed (attic/conv_narrow.py); the live lever is the
        # whole-head fusion (kernels/vel_head.py, routed in
        # VelocityField), which keeps both custom-call seams on
        # 3-channel tensors.
        # 96->96 convs hit a pathological XLA conv emitter (17.6 TFLOP/s
        # measured vs 52-79 for 96->64/64->64/64->96 at the same shape);
        # zero-padding both channel dims to the 128-lane width runs
        # 4.4x faster (77.7 TFLOP/s) and is exact: extra in-channels are
        # zeros, extra out-channels are sliced off (probe_conv2/3,
        # PERF.md). These are the decode up_blocks' second convs — the
        # single largest FLOP block of the UQ workload.
        cin, cout = kernel.shape[-2], kernel.shape[-1]
        # PULPO_NO_CONVPAD=1 disables the pad (for algorithmic-FLOP
        # accounting via cost_analysis — PERF.md roofline; never set it
        # on a perf path)
        if ndims == 3 and 96 <= cin < 128 and 96 <= cout < 128 \
                and not _routing.get("PULPO_NO_CONVPAD"):
            x = jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, 128 - cin),))
            kernel = jnp.pad(
                kernel, ((0, 0),) * ndims + ((0, 128 - cin), (0, 128 - cout)))
            return self._conv_xla(x, kernel, pad)[..., :cout]
        return self._conv_xla(x, kernel, pad)

    @staticmethod
    def _conv_xla(x, kernel, pad):
        ndims = x.ndim - 2
        # flax's channels-last dimension numbers (linear.py)
        nd = x.ndim
        lhs_spec = (0, nd - 1) + tuple(range(1, nd - 1))
        rhs_spec = (nd - 1, nd - 2) + tuple(range(0, nd - 2))
        dn = jax.lax.ConvDimensionNumbers(lhs_spec, rhs_spec, lhs_spec)
        return jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1,) * ndims, padding=pad,
            dimension_numbers=dn)

    @nn.compact
    def __call__(self, x, x2=None, y2=None, x2_features: int = 0,
                 act_half: bool = False):
        ndims = x.ndim - 2
        if act_half:
            c1, c2 = x2_features, x.shape[-1]
        else:
            c1 = x.shape[-1]
            c2 = x2_features if y2 is not None else (
                0 if x2 is None else x2.shape[-1])
        c_in = c1 + c2
        kshape = (self.kernel_size,) * ndims + (c_in, self.features)
        fan_in = c_in * self.kernel_size**ndims
        kernel = self.param("kernel", torch_kernel_init, kshape)
        bias = self.param("bias", torch_bias_init(fan_in), (self.features,))
        dtype = self.dtype or jnp.result_type(x.dtype, kernel.dtype)
        x, kernel, bias = (a.astype(dtype) for a in (x, kernel, bias))
        if act_half:
            return self._conv(x, kernel[..., c1:, :])
        y = self._conv(x, kernel if c2 == 0 else kernel[..., :c1, :])
        if y2 is None and x2 is not None:
            y2 = self._conv(x2.astype(dtype), kernel[..., c1:, :])
        if y2 is not None:
            y2 = y2.astype(dtype)
            if y2.shape[0] != x.shape[0]:
                s = x.shape[0] // y2.shape[0]
                assert s * y2.shape[0] == x.shape[0], (x.shape, y2.shape)
                y2 = jnp.broadcast_to(y2[None], (s, *y2.shape)).reshape(
                    s * y2.shape[0], *y2.shape[1:])
            y = y + y2
        return y + bias


class TorchConv(nn.Module):
    """Conv with torch-style kernel/bias initialization (and the split
    application of _RawConv via the optional ``x2``)."""

    features: int
    kernel_size: int = 3
    padding: str | int = "SAME"
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, x2=None, y2=None, x2_features: int = 0,
                 act_half: bool = False):
        # child named Conv_0 so the param tree matches the previous
        # nn.Conv-based implementation (checkpoints, torch importer)
        return _RawConv(
            self.features, self.kernel_size, self.padding, self.dtype,
            name="Conv_0",
        )(x, x2, y2=y2, x2_features=x2_features, act_half=act_half)


class ConvUnit(nn.Module):
    """Conv(k=3, pad=1) -> BatchNorm -> LeakyReLU(0.2)
    (network_blocks.py:11-29)."""

    features: int
    dtype: jnp.dtype | None = None
    bn_axis_name: str | None = None  # set to sync batch stats across DP replicas

    @nn.compact
    def __call__(self, x, train: bool = True, x2=None, y2=None,
                 x2_features: int = 0, act_half: bool = False):
        x = TorchConv(self.features, 3, "SAME", dtype=self.dtype)(
            x, x2, y2=y2, x2_features=x2_features, act_half=act_half)
        if act_half:
            # raw per-pair conv half for scan hoisting — BN/activation
            # apply only to the completed sum in the main path
            return x
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
    def __call__(self, x, train: bool = True, x2=None, y2=None,
                 x2_features: int = 0, act_half: bool = False):
        """`x2` feeds the FIRST ConvUnit's split application: equivalent
        to calling the sequence on concat([x, x2], -1). `y2`/`act_half`
        hoist that unit's per-pair conv half (see _RawConv)."""
        if act_half:
            return ConvUnit(self.features, self.dtype, self.bn_axis_name)(
                x, train, x2_features=x2_features, act_half=True)
        # fused plain-chain Pallas kernel (attic/conv_chain.py): the
        # whole eval ConvSequence in one MXU call — targets the full-res
        # narrow-input down_block_0 whose XLA convs run at 1.6-9.7 TF/s
        # (PERF.md). Eval only (BN running stats), plain calls only;
        # opt-in via PULPO_FUSED_CONVSEQ pending the composed A/B.
        if (x2 is None and y2 is None and not train
                and not self.is_initializing()
                and "batch_stats" in self.variables):
            from pulpo_tpu.attic.conv_chain import conv_chain, conv_chain_mode

            mode = conv_chain_mode(x, self.features, self.depth)
            if mode:
                pp = self.variables["params"]
                bs = self.variables["batch_stats"]
                stages = []
                for i in range(self.depth):
                    cu = pp[f"ConvUnit_{i}"]
                    cv = cu["TorchConv_0"]["Conv_0"]
                    bn = cu["BatchNorm_0"]
                    b = bs[f"ConvUnit_{i}"]["BatchNorm_0"]
                    stages.append({
                        "k": cv["kernel"], "b": cv["bias"],
                        "mean": b["mean"], "var": b["var"],
                        "scale": bn["scale"], "bias": bn["bias"],
                    })
                dt = self.dtype or jnp.result_type(
                    x.dtype, stages[0]["k"].dtype)
                return conv_chain(x.astype(dt), stages, mode[1],
                                  mode[0] == "interp")
        for i in range(self.depth):
            x = ConvUnit(self.features, self.dtype, self.bn_axis_name)(
                x, train, x2 if i == 0 else None,
                y2=y2 if i == 0 else None,
                x2_features=x2_features if i == 0 else 0)
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
        # fused whole-head Pallas kernel (kernels/vel_head.py): eval only
        # (BN running stats), depth-3 heads at level-res shapes. Params
        # are read straight from this module's bound variables — the
        # children below are only executed on the XLA path (and at init,
        # which creates them).
        from pulpo_tpu.kernels.vel_head import vel_head_mode, velocity_head

        if (not train and self.depth == 3 and not self.is_initializing()
                and "batch_stats" in self.variables
                and vel_head_mode(z, self.max_channels, self.ndims)):
            v = self.variables
            pp, bs = v["params"], v["batch_stats"]

            def unit(i):
                cu, b = pp[f"ConvUnit_{i}"], bs[f"ConvUnit_{i}"]["BatchNorm_0"]
                cv, bn = cu["TorchConv_0"]["Conv_0"], cu["BatchNorm_0"]
                n = i + 1
                return {f"k{n}": cv["kernel"], f"b{n}": cv["bias"],
                        f"mean{n}": b["mean"], f"var{n}": b["var"],
                        f"scale{n}": bn["scale"], f"bias{n}": bn["bias"]}

            p = {**unit(0), **unit(1),
                 "k3": pp["TorchConv_0"]["Conv_0"]["kernel"],
                 "b3": pp["TorchConv_0"]["Conv_0"]["bias"]}
            dt = self.dtype or jnp.result_type(z.dtype, p["k1"].dtype)
            return velocity_head(
                z.astype(dt), p,
                vel_head_mode(z, self.max_channels, self.ndims) == "interp")
        x = ConvUnit(self.max_channels, self.dtype, self.bn_axis_name)(z, train)
        for _ in range(self.depth - 2):
            x = ConvUnit(self.max_channels, self.dtype, self.bn_axis_name)(x, train)
        return TorchConv(self.ndims, 1, "SAME", dtype=self.dtype)(x)
