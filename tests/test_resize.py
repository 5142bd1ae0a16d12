"""Golden tests: resize/pooling vs torch (reference semantics).

Reference ops: F.interpolate(mode='bi/trilinear', align_corners=False)
(src/network_blocks.py:141-147, src/losses.py:313) and
AvgPool(k=2, s=2, ceil_mode=True) (src/components/pulpo.py:33).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from pulpo_tpu.ops.resize import resize_linear, avg_pool_ceil


def to_torch(x_last):
    """channels-last numpy -> torch NCHW/NCDHW"""
    nd = x_last.ndim - 2
    perm = (0, x_last.ndim - 1) + tuple(range(1, 1 + nd))
    return torch.from_numpy(np.transpose(x_last, perm).copy())


def to_last(t):
    nd = t.ndim - 2
    perm = (0,) + tuple(range(2, 2 + nd)) + (1,)
    return np.transpose(t.numpy(), perm)


@pytest.mark.parametrize("shape,out", [
    ((2, 7, 9, 3), (14, 18)),
    ((1, 8, 8, 1), (5, 3)),
    ((2, 6, 7, 5, 2), (12, 14, 10)),
    ((1, 5, 6, 7, 3), (10, 12, 14)),
    ((1, 4, 4, 4, 3), (7, 7, 7)),  # non-integer scale
])
def test_resize_matches_torch_size(shape, out):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(shape).astype(np.float32)
    mode = "trilinear" if len(out) == 3 else "bilinear"
    ref = to_last(F.interpolate(to_torch(x), size=out, mode=mode, align_corners=False))
    got = np.asarray(resize_linear(x, out))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape,factor", [
    ((1, 5, 6, 3), 2.0),
    ((1, 8, 6, 3), 0.5),
    ((2, 4, 6, 5, 3), 2.0),
    ((1, 4, 6, 8, 3), 1.75),
])
def test_resize_matches_torch_scale_factor(shape, factor):
    rng = np.random.default_rng(1)
    x = rng.standard_normal(shape).astype(np.float32)
    nd = len(shape) - 2
    mode = "trilinear" if nd == 3 else "bilinear"
    ref = to_last(
        F.interpolate(to_torch(x), scale_factor=factor, mode=mode, align_corners=False)
    )
    out_size = tuple(int(s * factor) for s in shape[1:-1])
    got = np.asarray(resize_linear(x, out_size, scales=(factor,) * nd))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape", [
    (2, 7, 9, 3),
    (1, 8, 8, 1),
    (2, 5, 7, 9, 2),
    (1, 160 // 8, 192 // 8, 224 // 8, 1),
])
def test_avg_pool_ceil_matches_torch(shape):
    rng = np.random.default_rng(2)
    x = rng.standard_normal(shape).astype(np.float32)
    nd = len(shape) - 2
    pool = F.avg_pool2d if nd == 2 else F.avg_pool3d
    ref = to_last(pool(to_torch(x), kernel_size=2, stride=2, padding=0, ceil_mode=True))
    got = np.asarray(avg_pool_ceil(x))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
