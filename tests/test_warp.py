"""Golden tests: warp / SVF integration / vector-field resize vs torch.

Reference: SpatialTransformer, VecInt, ResizeTransform
(src/network_blocks.py:88-177).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from pulpo_tpu.ops.warp import warp_image, integrate_svf, resize_vecfield, warp_landmarks


def to_torch(x_last):
    nd = x_last.ndim - 2
    perm = (0, x_last.ndim - 1) + tuple(range(1, 1 + nd))
    return torch.from_numpy(np.transpose(x_last, perm).copy())


def to_last(t):
    nd = t.ndim - 2
    perm = (0,) + tuple(range(2, 2 + nd)) + (1,)
    return np.transpose(t.detach().numpy(), perm)


def torch_spatial_transformer(df_t, moving_t):
    """Reference SpatialTransformer.forward (network_blocks.py:101-121)."""
    size = moving_t.shape[2:]
    vectors = [torch.arange(0, s, dtype=torch.float32) for s in size]
    grid = torch.stack(torch.meshgrid(vectors, indexing="ij")).unsqueeze(0)
    new_locs = grid + df_t
    for i in range(len(size)):
        new_locs[:, i] = 2 * (new_locs[:, i] / (size[i] - 1) - 0.5)
    if len(size) == 2:
        new_locs = new_locs.permute(0, 2, 3, 1)[..., [1, 0]]
    else:
        new_locs = new_locs.permute(0, 2, 3, 4, 1)[..., [2, 1, 0]]
    return F.grid_sample(
        moving_t, new_locs, mode="bilinear", padding_mode="border", align_corners=False
    )


def torch_vecint(vec_t, nsteps=7):
    vec_t = vec_t * (1.0 / 2**nsteps)
    for _ in range(nsteps):
        vec_t = vec_t + torch_spatial_transformer(vec_t, vec_t)
    return vec_t


def torch_resize_transform(x_t, vel_resize, ndims):
    factor = 1.0 / vel_resize
    mode = "bilinear" if ndims == 2 else "trilinear"
    if factor < 1:
        x_t = F.interpolate(x_t, align_corners=False, scale_factor=factor, mode=mode)
        x_t = factor * x_t
    elif factor > 1:
        x_t = factor * x_t
        x_t = F.interpolate(x_t, align_corners=False, scale_factor=factor, mode=mode)
    return x_t


@pytest.mark.parametrize("spatial,channels", [
    ((9, 11), 1),
    ((8, 8), 3),
    ((6, 7, 8), 1),
    ((10, 12, 14), 3),
])
def test_warp_matches_grid_sample(spatial, channels):
    rng = np.random.default_rng(3)
    nd = len(spatial)
    moving = rng.standard_normal((2, *spatial, channels)).astype(np.float32)
    # displacements up to ~2 voxels incl. out-of-bounds samples
    df = (2.5 * rng.standard_normal((2, *spatial, nd))).astype(np.float32)
    ref = to_last(torch_spatial_transformer(to_torch(df), to_torch(moving)))
    got = np.asarray(warp_image(moving, df))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("spatial", [(8, 10), (6, 8, 10)])
def test_integrate_svf_matches_vecint(spatial):
    rng = np.random.default_rng(4)
    nd = len(spatial)
    vec = (3.0 * rng.standard_normal((1, *spatial, nd))).astype(np.float32)
    ref = to_last(torch_vecint(to_torch(vec), nsteps=7))
    got = np.asarray(integrate_svf(vec, nsteps=7))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("spatial,vel_resize", [
    ((5, 6), 1 / 2),       # upsample x2
    ((8, 10), 2.0),        # downsample x0.5
    ((4, 6, 8), 1 / 2),
    ((4, 6, 8), 1.0),      # identity
    ((4, 4, 4), 4 / 7),    # non-integer upsample
])
def test_resize_vecfield_matches_resize_transform(spatial, vel_resize):
    rng = np.random.default_rng(5)
    nd = len(spatial)
    x = rng.standard_normal((2, *spatial, nd)).astype(np.float32)
    ref = to_last(torch_resize_transform(to_torch(x), vel_resize, nd))
    got = np.asarray(resize_vecfield(x, vel_resize))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_warp_identity_df_is_near_identity():
    """Zero displacement: align_corners=False + (size-1) normalization is
    *not* an exact identity at non-border voxels (src = loc*size/(size-1)
    - 0.5). Verify we reproduce torch rather than an idealized identity."""
    rng = np.random.default_rng(6)
    moving = rng.standard_normal((1, 12, 13, 14, 1)).astype(np.float32)
    df = np.zeros((1, 12, 13, 14, 3), dtype=np.float32)
    ref = to_last(torch_spatial_transformer(to_torch(df), to_torch(moving)))
    got = np.asarray(warp_image(moving, df))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_warp_cross_resolution_matches_torch():
    """models.py:330 warps the *full-res* moving image with a level-res
    df: grid normalized by df size, unnormalized by image size."""
    rng = np.random.default_rng(8)
    moving = rng.standard_normal((1, 12, 14, 16, 1)).astype(np.float32)
    df = (1.5 * rng.standard_normal((1, 6, 7, 8, 3))).astype(np.float32)

    df_t, mov_t = to_torch(df), to_torch(moving)
    size = (6, 7, 8)
    vectors = [torch.arange(0, s, dtype=torch.float32) for s in size]
    grid = torch.stack(torch.meshgrid(vectors, indexing="ij")).unsqueeze(0)
    new_locs = grid + df_t
    for i in range(3):
        new_locs[:, i] = 2 * (new_locs[:, i] / (size[i] - 1) - 0.5)
    new_locs = new_locs.permute(0, 2, 3, 4, 1)[..., [2, 1, 0]]
    ref = to_last(F.grid_sample(mov_t, new_locs, mode="bilinear",
                                padding_mode="border", align_corners=False))
    got = np.asarray(warp_image(moving, df))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_warp_landmarks_matches_reference():
    """Reference: src/components/utils.py:15-25."""
    rng = np.random.default_rng(7)
    df = rng.standard_normal((1, 6, 7, 8, 3)).astype(np.float32)
    lm = np.stack(
        [rng.integers(0, 6, 5), rng.integers(0, 7, 5), rng.integers(0, 8, 5)], -1
    ).astype(np.float32)[None]

    lm_t = torch.from_numpy(lm).long()
    df_t = to_torch(df)
    ref = (
        torch.from_numpy(lm).long()
        - df_t[:, :, lm_t[0, :, 0], lm_t[0, :, 1], lm_t[0, :, 2]].transpose(-2, -1)
    ).numpy()
    got = np.asarray(warp_landmarks(lm, df))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)
