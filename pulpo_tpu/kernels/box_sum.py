"""Pallas TPU box-filter sums (the windowed-NCC building block).

The reference computes local NCC with five ones-kernel convolutions
(losses.py:99-122: zero padding win//2, stride 1). On TPU we compute the
separable box sums as shifted adds in VMEM:

- kernel A: per (batch*depth) plane, H- and W-axis box sums fused in one
  VMEM-resident pass,
- kernel B (3D only): per (batch*height) slab, D-axis box sum.

The box filter is symmetric and zero-padded, so it is self-adjoint; the
custom VJP is the same box sum applied to the cotangent — exact, and it
keeps jax.grad working through pallas_call.

Falls back to lax.reduce_window off-TPU or when disabled.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _box_axis(x: jnp.ndarray, win: int, axis: int) -> jnp.ndarray:
    """Zero-padded box sum along `axis` via shifted adds (in-kernel)."""
    p = win // 2
    acc = x
    size = x.shape[axis]
    for k in range(1, p + 1):
        zeros_lo = jax.lax.slice_in_dim(jnp.zeros_like(x), 0, k, axis=axis)
        hi = jax.lax.slice_in_dim(x, k, size, axis=axis)
        lo = jax.lax.slice_in_dim(x, 0, size - k, axis=axis)
        acc = acc + jnp.concatenate([hi, zeros_lo], axis=axis)
        acc = acc + jnp.concatenate([zeros_lo, lo], axis=axis)
    return acc


def _hw_kernel(win: int):
    def kernel(x_ref, o_ref):
        x = x_ref[0]
        x = _box_axis(x, win, 0)
        x = _box_axis(x, win, 1)
        o_ref[0] = x

    return kernel


def _d_kernel(win: int):
    def kernel(x_ref, o_ref):
        # (D, T) slab: D-axis box sum, lanes are flattened (h*w) tiles
        o_ref[0] = _box_axis(x_ref[0], win, 0)

    return kernel


@functools.partial(jax.jit, static_argnums=(1, 2))
def _box_sum_pallas(x: jnp.ndarray, win: int, interpret: bool) -> jnp.ndarray:
    """x: (B, D, H, W) or (B, H, W); zero-padded box sum over spatial."""
    if x.ndim == 3:
        b, h, w = x.shape
        return pl.pallas_call(
            _hw_kernel(win),
            grid=(b,),
            in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            interpret=interpret,
        )(x)

    b, d, h, w = x.shape
    # pass 1: H, W within each (b, d) plane
    y = pl.pallas_call(
        _hw_kernel(win),
        grid=(b * d,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * d, h, w), x.dtype),
        interpret=interpret,
    )(x.reshape(b * d, h, w))
    # pass 2: D-axis sum with lanes = flattened (h*w). Block (d, T):
    # dim -2 covers the full d axis and T is a 128-multiple (or the full
    # flattened width), satisfying Mosaic's (8, 128) tiling rule for any
    # level shape. Box sums don't mix lanes, so ragged final-tile
    # padding is discarded harmlessly.
    hw = h * w
    t = hw if hw <= 4096 else 4096
    y = pl.pallas_call(
        _d_kernel(win),
        grid=(b, -(-hw // t)),
        in_specs=[pl.BlockSpec((1, d, t), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, d, t), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d, hw), x.dtype),
        interpret=interpret,
    )(y.reshape(b, d, hw))
    return y.reshape(b, d, h, w)


def _box_sum_xla(x: jnp.ndarray, win: int) -> jnp.ndarray:
    pad = win // 2
    ndim = x.ndim
    for ax in range(1, ndim):
        window = [1] * ndim
        window[ax] = win
        padding = [(0, 0)] * ndim
        padding[ax] = (pad, pad)
        x = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, tuple(window), (1,) * ndim, tuple(padding))
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _box_sum(x: jnp.ndarray, win: int, impl: str) -> jnp.ndarray:
    if impl == "xla":
        return _box_sum_xla(x, win)
    return _box_sum_pallas(x, win, impl == "interpret")


def _box_sum_fwd(x, win, impl):
    return _box_sum(x, win, impl), None


def _box_sum_bwd(win, impl, _res, g):
    # symmetric zero-padded filter: self-adjoint
    return (_box_sum(g, win, impl),)


_box_sum.defvjp(_box_sum_fwd, _box_sum_bwd)


def box_sum_nd(x: jnp.ndarray, win: int, impl: str | None = None) -> jnp.ndarray:
    """Zero-padded box-filter sum over all spatial axes.

    x: (B, *spatial, C) channels-last with C folded by the caller, or
    (B, *spatial). impl: 'pallas' | 'interpret' | 'xla' | None (auto).
    """
    if impl is None:
        from pulpo_tpu.kernels import pallas_available

        impl = "pallas" if pallas_available() else "xla"
    if win <= 1:
        return x
    return _box_sum(x, win, impl)
