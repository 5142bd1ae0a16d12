"""Separable linear resampling and ceil-mode average pooling, as matmuls.

TPU-first design: instead of gather-based interpolation, each spatial
axis is resampled by a dense (out, in) interpolation matrix applied with
`jnp.einsum`. XLA maps these onto the MXU and fuses the per-axis passes;
the matrices are trace-time constants.

Semantics replicate the PyTorch reference exactly:

- linear resize == ``F.interpolate(mode='bi/trilinear',
  align_corners=False)`` (reference: src/network_blocks.py:141-147,
  src/losses.py:313): half-pixel mapping ``src = (dst+0.5)/scale - 0.5``
  clamped to ``>= 0``, upper neighbor index clamped to ``in-1``.
- average pooling == ``AvgPool(kernel_size=2, stride=2, padding=0,
  ceil_mode=True)`` (reference: src/components/pulpo.py:33,167-179):
  the final clipped window averages over the *actual* element count.

Verified against torch 2.13 CPU goldens in tests/test_resize.py.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _linear_matrix(in_size: int, out_size: int, scale: float | None) -> np.ndarray:
    """(out, in) linear interpolation matrix, torch align_corners=False."""
    if in_size == out_size and scale in (None, 1.0):
        return np.eye(in_size, dtype=np.float32)
    if scale is None:
        scale = out_size / in_size
    dst = np.arange(out_size, dtype=np.float64)
    src = np.maximum((dst + 0.5) / scale - 0.5, 0.0)
    i0 = np.floor(src).astype(np.int64)
    i0 = np.minimum(i0, in_size - 1)
    i1 = np.minimum(i0 + 1, in_size - 1)
    w = (src - i0).astype(np.float32)
    m = np.zeros((out_size, in_size), dtype=np.float32)
    np.add.at(m, (np.arange(out_size), i0), 1.0 - w)
    np.add.at(m, (np.arange(out_size), i1), w)
    return m


@functools.lru_cache(maxsize=None)
def _avgpool_matrix(in_size: int) -> np.ndarray:
    """(ceil(in/2), in) matrix for k=2 s=2 ceil-mode average pooling."""
    out_size = -(-in_size // 2)
    m = np.zeros((out_size, in_size), dtype=np.float32)
    for j in range(out_size):
        lo = 2 * j
        hi = min(lo + 2, in_size)
        m[j, lo:hi] = 1.0 / (hi - lo)
    return m


def _apply_axis_matrix(x: jnp.ndarray, m: np.ndarray, axis: int) -> jnp.ndarray:
    """Contract axis `axis` of x with (out, in) matrix m."""
    mj = jnp.asarray(m, dtype=x.dtype)
    x = jnp.moveaxis(x, axis, -1)
    y = jnp.matmul(x, mj.T)
    return jnp.moveaxis(y, -1, axis)


def resize_linear(
    x: jnp.ndarray,
    out_size: tuple[int, ...],
    spatial_axes: tuple[int, ...] | None = None,
    scales: tuple[float, ...] | None = None,
) -> jnp.ndarray:
    """Multi-axis linear resize matching F.interpolate(align_corners=False).

    Args:
      x: array with spatial axes (default: all but first and last, i.e.
        channels-last layout (B, *spatial, C)).
      out_size: target size per spatial axis.
      spatial_axes: which axes are spatial. Default (1, ..., ndim-2).
      scales: optional explicit torch-style scale_factors (used in the
        coordinate mapping when torch was called with scale_factor).
    """
    if spatial_axes is None:
        spatial_axes = tuple(range(1, x.ndim - 1))
    assert len(out_size) == len(spatial_axes)
    for i, ax in enumerate(spatial_axes):
        scale = None if scales is None else scales[i]
        if x.shape[ax] == out_size[i] and scale in (None, 1.0):
            continue
        m = _linear_matrix(x.shape[ax], int(out_size[i]), scale)
        x = _apply_axis_matrix(x, m, ax)
    return x


def avg_pool_ceil(x: jnp.ndarray, spatial_axes: tuple[int, ...] | None = None) -> jnp.ndarray:
    """k=2 s=2 ceil-mode average pooling over the spatial axes."""
    if spatial_axes is None:
        spatial_axes = tuple(range(1, x.ndim - 1))
    for ax in spatial_axes:
        m = _avgpool_matrix(x.shape[ax])
        x = _apply_axis_matrix(x, m, ax)
    return x


def avg_pool_pyramid(x: jnp.ndarray, num_levels: int) -> list[jnp.ndarray]:
    """[x, pool(x), pool(pool(x)), ...] — `num_levels` entries."""
    out = [x]
    for _ in range(num_levels - 1):
        out.append(avg_pool_ceil(out[-1]))
    return out
