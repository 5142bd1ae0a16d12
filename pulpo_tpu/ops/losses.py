"""Loss functions and regularizers, matching src/losses.py of the reference.

All functions are pure, channels-last ((B, *spatial, C)), and reproduce
the reference's exact reduction semantics (sums over spatial dims, means
over batch/channel, constant-denominator NCC windows, Bessel-corrected
std, ...). Golden-tested against torch CPU in tests/test_losses.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _spatial_axes(x: jnp.ndarray) -> tuple[int, ...]:
    return tuple(range(1, x.ndim - 1))


# ---------------------------------------------------------------------------
# KL divergences
# ---------------------------------------------------------------------------


def kl_two_gauss_diag_cov(
    mu0: jnp.ndarray,
    sigma0: jnp.ndarray,
    mu1: jnp.ndarray,
    sigma1: jnp.ndarray,
    eps: float = 1e-10,
) -> jnp.ndarray:
    """KL[p0 || p1] with diagonal covariances (reference losses.py:47-76).

    Flattens per sample, sums over features, means over batch.
    """
    b = mu0.shape[0]
    s0 = jnp.square(sigma0.reshape(b, -1))
    s1 = jnp.square(sigma1.reshape(b, -1))
    log_s0 = jnp.log(s0 + eps)
    log_s1 = jnp.log(s1 + eps)
    m0 = mu0.reshape(b, -1)
    m1 = mu1.reshape(b, -1)
    per_sample = 0.5 * jnp.sum(
        (s0 + jnp.square(m1 - m0)) / (s1 + eps) + log_s1 - log_s0 - 1.0, axis=1
    )
    return jnp.mean(per_sample)


def degree_matrix(spatial: tuple[int, ...]) -> jnp.ndarray:
    """Neighbor-count matrix: 3^nd ones-conv of a ones volume, minus 1.

    Reference losses.py:18-22 (built once at construction; here a
    trace-time constant). Shape (*spatial, 1) for channels-last broadcast.
    """
    import numpy as np

    d = np.ones(spatial, dtype=np.float32)
    for ax in range(len(spatial)):
        k = np.ones(3, dtype=np.float32)
        d = np.apply_along_axis(lambda v: np.convolve(v, k, mode="same"), ax, d)
    return jnp.asarray(d - 1.0)[..., None]


def kl_nondiagonal(
    flow_mean: jnp.ndarray,
    flow_sigma: jnp.ndarray,
    prior_lambda: float = 20.0,
) -> jnp.ndarray:
    """VoxelMorph-diff-style KL with a smoothness prior (losses.py:8-44).

    The reference's prior mean/sigma arguments are unused by its loss
    body and omitted here. The degree matrix / prodsize are computed from
    the actual array shape; the reference uses floor-divided level sizes
    (models.py:69) which agree for all even-size configs (odd sizes crash
    the reference with a shape mismatch, so no behavior is lost).
    """
    spatial = flow_mean.shape[1:-1]
    ndims = len(spatial)
    prodsize = 1
    for s in spatial:
        prodsize *= s

    sigma2 = jnp.square(flow_sigma)
    d = degree_matrix(spatial).astype(flow_sigma.dtype)
    sigma_term = prior_lambda * d * sigma2 - jnp.log(sigma2)

    sm = 0.0
    for ax in _spatial_axes(flow_mean):
        df = jnp.diff(flow_mean, axis=ax)
        sm = sm + jnp.mean(df * df)
    precision = 0.5 * sm / ndims

    return (jnp.mean(sigma_term) + (prior_lambda / 2.0) * precision) * ndims * 0.5 * prodsize


# ---------------------------------------------------------------------------
# Reconstruction losses
# ---------------------------------------------------------------------------


def l2_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """MSE summed over spatial dims, mean over batch & channel
    (losses.py:79-83)."""
    se = jnp.square(pred - target)
    return jnp.mean(jnp.sum(se, axis=_spatial_axes(pred)))


def _box_sum(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """Separable zero-padded box-filter sum over the spatial axes.

    Equivalent to the reference's ones-kernel convs with pad win//2
    (losses.py:99-122). Routed to the Pallas VMEM kernel on TPU
    (pulpo_tpu/kernels/box_sum.py), lax.reduce_window elsewhere.
    Expects channels-last with C == 1 (the NCC contract).
    """
    from pulpo_tpu.kernels.box_sum import box_sum_nd

    assert x.shape[-1] == 1, (
        f"_box_sum expects single-channel input, got C={x.shape[-1]} "
        "(the reference's 1-channel conv filter would raise too)"
    )
    squeezed = x[..., 0]  # (B, *spatial)
    return box_sum_nd(squeezed, win)[..., None]


def ncc_loss(
    y_pred: jnp.ndarray,
    y_true: jnp.ndarray,
    win_size: int = 9,
    gamma: float = 0.05,
) -> jnp.ndarray:
    """Local squared normalized cross-correlation (losses.py:85-135).

    Border behavior matches the reference: zero-padded box sums with a
    *constant* window-volume denominator even at borders. Returns
    -sum(cc) * gamma after a batch-mean. Expects C == 1.
    """
    ii = y_true
    ji = y_pred
    ndims = len(ii.shape[1:-1])
    assert ndims in (2, 3)

    i_sum = _box_sum(ii, win_size)
    j_sum = _box_sum(ji, win_size)
    i2_sum = _box_sum(ii * ii, win_size)
    j2_sum = _box_sum(ji * ji, win_size)
    ij_sum = _box_sum(ii * ji, win_size)

    w = float(win_size**ndims)
    u_i = i_sum / w
    u_j = j_sum / w
    cross = ij_sum - u_j * i_sum - u_i * j_sum + u_i * u_j * w
    i_var = i2_sum - 2 * u_i * i_sum + u_i * u_i * w
    j_var = j2_sum - 2 * u_j * j_sum + u_j * u_j * w

    cc = cross * cross / (i_var * j_var + 1e-8)
    cc = jnp.mean(cc, axis=0)
    return -jnp.sum(cc) * gamma


def soft_dice_loss(
    pred: jnp.ndarray, target: jnp.ndarray, dice_factor: float = 1.0
) -> jnp.ndarray:
    """Soft dice over spatial dims (losses.py:137-145)."""
    axes = _spatial_axes(pred)
    spatial = pred.shape[1:-1]
    prod_size = 1
    for s in spatial:
        prod_size *= s
    eps = 1e-6
    dice = (2.0 * jnp.sum(target * pred, axis=axes) + eps) / (
        jnp.sum(target**2, axis=axes) + jnp.sum(pred**2, axis=axes) + eps
    )
    return jnp.mean(1.0 - dice) * prod_size / dice_factor


# ---------------------------------------------------------------------------
# Deformation-field regularizers / metrics
# ---------------------------------------------------------------------------


def _central_diff(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """(x[i+1] - x[i-1]) / 2 with replicated edges (losses.py:158-193)."""
    upper = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 1, x.shape[axis], axis=axis),
         jax.lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis], axis=axis)],
        axis=axis,
    )
    lower = jnp.concatenate(
        [jax.lax.slice_in_dim(x, 0, 1, axis=axis),
         jax.lax.slice_in_dim(x, 0, x.shape[axis] - 1, axis=axis)],
        axis=axis,
    )
    return 0.5 * (upper - lower)


def jacobian_det(df: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
    """Jacobian determinant of a displacement field (losses.py:147-199).

    df: (B, *spatial, ndims), channel i = displacement along axis i.
    Returns (B, *spatial). Reproduces the reference's exact voxel
    re-scaling: channels are flipped then scaled by ((size_axis-1)-1)/2
    where size_axis follows the *unflipped* axis order.
    """
    spatial = df.shape[1:-1]
    ndims = len(spatial)
    assert ndims in (2, 3)

    if normalize:
        scale = jnp.asarray([2.0 / s for s in spatial], dtype=df.dtype)
        df = df * scale

    # disp_field_vox = df.flip(channel) * ((size-1)-1)/2  (losses.py:166,190)
    flipped = df[..., ::-1]
    vox_scale = jnp.asarray([(s - 1 - 1) / 2.0 for s in spatial], dtype=df.dtype)
    disp_vox = flipped * vox_scale

    # grads[i][..., c] = central diff along spatial axis i of channel c
    grads = [
        _central_diff(disp_vox, axis=1 + i) for i in range(ndims)
    ]  # each (B, *spatial, ndims)

    if ndims == 2:
        j00 = grads[0][..., 0] + 1.0
        j01 = grads[0][..., 1]
        j10 = grads[1][..., 0]
        j11 = grads[1][..., 1] + 1.0
        return j00 * j11 - j10 * j01

    j = [[grads[i][..., c] + (1.0 if i == c else 0.0) for c in range(3)] for i in range(3)]
    det = (
        j[0][0] * (j[1][1] * j[2][2] - j[2][1] * j[1][2])
        - j[0][1] * (j[1][0] * j[2][2] - j[2][0] * j[1][2])
        + j[0][2] * (j[1][0] * j[2][1] - j[2][0] * j[1][1])
    )
    return det


def jdet_std(df: jnp.ndarray, lamb: float = 0.0, normalize: bool = True) -> jnp.ndarray:
    """lamb * std(jacobian_det(df)); Bessel-corrected like torch.std
    (losses.py:202-204)."""
    return lamb * jnp.std(jacobian_det(df, normalize=normalize), ddof=1)


def l2_reg(df: jnp.ndarray, lamb: float = 0.0) -> jnp.ndarray:
    """Diffusion regularizer: mean squared forward differences
    * lamb * prod(spatial) (losses.py:207-222)."""
    spatial = df.shape[1:-1]
    ndims = len(spatial)
    prod_size = 1.0
    for s in spatial:
        prod_size *= s

    # crop [1:, 1:, (1:)] on every spatial axis, like the reference
    def crop_except(x, keep_axis):
        for i in range(ndims):
            ax = 1 + i
            if i == keep_axis:
                x = jax.lax.slice_in_dim(x, 0, x.shape[ax] - 1, axis=ax)
            else:
                x = jax.lax.slice_in_dim(x, 1, x.shape[ax], axis=ax)
        return x

    base = df
    for i in range(ndims):
        base = jax.lax.slice_in_dim(base, 1, base.shape[1 + i], axis=1 + i)

    total = 0.0
    for i in range(ndims):
        shifted = crop_except(df, i)
        total = total + jnp.square(base - shifted)
    return jnp.mean(total) * lamb * prod_size


# ---------------------------------------------------------------------------
# Hierarchical wrappers (losses.py:225-355)
# ---------------------------------------------------------------------------


def hierarchical_kl_loss(
    prior_mus: dict[int, jnp.ndarray],
    prior_sigmas: dict[int, jnp.ndarray],
    posterior_mus: dict[int, jnp.ndarray],
    posterior_sigmas: dict[int, jnp.ndarray],
    weight_dict: dict[int, float],
    nondiagonal: bool = False,
    prior_lambda: float = 20.0,
) -> tuple[jnp.ndarray, dict[int, jnp.ndarray]]:
    total = 0.0
    levels = {}
    for l, w in weight_dict.items():
        if nondiagonal:
            levels[l] = w * kl_nondiagonal(
                posterior_mus[l], posterior_sigmas[l], prior_lambda=prior_lambda
            )
        else:
            levels[l] = w * kl_two_gauss_diag_cov(
                posterior_mus[l], posterior_sigmas[l], prior_mus[l], prior_sigmas[l]
            )
        total = total + levels[l]
    return total, levels


def hierarchical_reconstruction_loss(
    y_hat: dict[int, jnp.ndarray],
    y: jnp.ndarray,
    weight_dict: dict[int, float],
    recon_loss: tuple[str, ...],
    window_size: dict[int, int],
    gamma: float = 0.05,
    dice_factor: float = 1.0,
    y_hat_seg: dict[int, jnp.ndarray] | None = None,
    seg_y: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, dict[int, jnp.ndarray]]:
    """Per level: resize full-res target down to y_hat[l]'s size (linear,
    align_corners=False; losses.py:313), add each selected loss, divide by
    len(recon_loss), weight and sum."""
    from pulpo_tpu.ops.resize import resize_linear

    total = 0.0
    levels = {}
    for l, w in weight_dict.items():
        target = resize_linear(y, y_hat[l].shape[1:-1])
        lvl = 0.0
        if "mse" in recon_loss:
            lvl = lvl + w * l2_loss(y_hat[l], target)
        if "ncc" in recon_loss:
            lvl = lvl + w * ncc_loss(y_hat[l], target, win_size=window_size[l], gamma=gamma)
        if "dice" in recon_loss:
            seg_target = resize_linear(seg_y, y_hat_seg[l].shape[1:-1])
            lvl = lvl + w * soft_dice_loss(y_hat_seg[l], seg_target, dice_factor=dice_factor)
        levels[l] = lvl / len(recon_loss)
        total = total + levels[l]
    return total, levels


def hierarchical_regularization(
    dfs: dict[int, jnp.ndarray],
    weight_dict: dict[int, float],
    regularizer: str = "L2",
    lamb: float = 0.0,
) -> tuple[jnp.ndarray, dict[int, jnp.ndarray]]:
    reg = l2_reg if regularizer == "L2" else jdet_std
    total = 0.0
    levels = {}
    for l, w in weight_dict.items():
        levels[l] = w * reg(dfs[l], lamb)
        total = total + levels[l]
    return total, levels
