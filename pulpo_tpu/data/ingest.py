"""On-device ingest: jitted normalization / resampling of raw volumes.

The reference preprocesses offline in notebooks (NIfTI -> h5, per-volume
z-norm + clip + min-max, geometry crops; src/data/*/convert_to_h5py.ipynb
— mirrored host-side in data/convert.py). For pod-scale training
(BASELINE config 5) that stage moves on-device: raw volumes stream to
the chip and a single compiled program normalizes, resamples and stacks
them — the "on-device preprocessing stage" of the north star.

All functions are shape-static and jit-compatible; `make_ingest`
returns the compiled pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pulpo_tpu.ops.resize import resize_linear


def znorm_clip_minmax(img: jnp.ndarray, clip: float = 6.0) -> jnp.ndarray:
    """Per-volume z-normalize, clip to +-clip, min-max to [0, 1] — the
    BraTS converter normalization (data/convert.py:_brats_normalize,
    reference convert_to_h5py.ipynb cell 4), as one fused on-device op.

    img: (*spatial,) or (B, *spatial[, C]); statistics are per leading
    batch element when a batch axis is present (ndim >= 4).
    """
    img = img.astype(jnp.float32)
    if img.ndim >= 4:  # batched: per-volume stats
        axes = tuple(range(1, img.ndim))
        keep = dict(axis=axes, keepdims=True)
    else:
        keep = dict(axis=None, keepdims=True)
    m = jnp.mean(img, **keep)
    s = jnp.std(img, **keep) + 1e-8
    img = jnp.clip((img - m) / s, -clip, clip)
    lo = jnp.min(img, **keep)
    hi = jnp.max(img, **keep)
    return (img - lo) / jnp.maximum(hi - lo, 1e-8)


def minmax(img: jnp.ndarray, max_val: float | None = None) -> jnp.ndarray:
    """Min-max normalization; `max_val` fixes the divisor (the OASIS
    test_lm convention with the hardcoded max, convert.py docstring)."""
    img = img.astype(jnp.float32)
    if max_val is not None:
        return img / max_val
    lo, hi = jnp.min(img), jnp.max(img)
    return (img - lo) / jnp.maximum(hi - lo, 1e-8)


def resample_volume(img: jnp.ndarray, target: tuple[int, ...]) -> jnp.ndarray:
    """Linear (align_corners=False) resample of (B, *spatial, C) to
    `target` spatial shape — on-device replacement for offline
    re-gridding."""
    return resize_linear(img.astype(jnp.float32), tuple(target))


@functools.lru_cache(maxsize=None)
def make_ingest(target: tuple[int, ...] | None = None,
                normalize: str = "znorm", clip: float = 6.0):
    """Compiled ingest pipeline for a raw volume batch (B, *spatial, C):
    optional resample to `target`, then `normalize` in
    {"znorm", "minmax", "none"}."""

    def pipeline(img):
        img = img.astype(jnp.float32)
        if target is not None:
            img = resample_volume(img, target)
        if normalize == "znorm":
            img = znorm_clip_minmax(img, clip=clip)
        elif normalize == "minmax":
            img = minmax(img)
        return img

    return jax.jit(pipeline)


def ingest(img, target: tuple[int, ...] | None = None,
           normalize: str = "znorm", clip: float = 6.0) -> jnp.ndarray:
    """One-call on-device ingest (see make_ingest)."""
    return make_ingest(None if target is None else tuple(target),
                       normalize, clip)(jnp.asarray(img))
