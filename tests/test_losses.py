"""Golden tests: losses vs the reference implementation itself.

The upstream reference (read-only at /root/reference) is imported as the
test oracle and executed on CPU torch; tests are skipped when it is not
mounted. Nothing from it is used at runtime by pulpo_tpu.
"""

import sys

import numpy as np
import pytest
import torch

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

ref_losses = pytest.importorskip("src.losses", reason="reference not mounted")

from pulpo_tpu.ops import losses as jl  # noqa: E402
from pulpo_tpu.config import PULPoConfig  # noqa: E402


def to_torch(x_last):
    nd = x_last.ndim - 2
    perm = (0, x_last.ndim - 1) + tuple(range(1, 1 + nd))
    return torch.from_numpy(np.transpose(x_last, perm).copy())


def rand(shape, seed, positive=False):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal(shape).astype(np.float32)
    return np.abs(x) + 0.1 if positive else x


@pytest.mark.parametrize("shape", [(2, 6, 7, 3), (1, 4, 5, 6, 3)])
def test_kl_diag(shape):
    mu0, mu1 = rand(shape, 10), rand(shape, 11)
    s0, s1 = rand(shape, 12, True), rand(shape, 13, True)
    ref = ref_losses.KL_two_gauss_with_diag_cov(
        to_torch(mu0), to_torch(s0), to_torch(mu1), to_torch(s1)
    ).item()
    got = float(jl.kl_two_gauss_diag_cov(mu0, s0, mu1, s1))
    np.testing.assert_allclose(got, ref, rtol=1e-4)


@pytest.mark.parametrize("spatial", [(6, 8), (4, 6, 8)])
def test_kl_nondiagonal(spatial):
    nd = len(spatial)
    mu = rand((2, *spatial, nd), 14)
    sigma = rand((2, *spatial, nd), 15, True)
    ref_kl = ref_losses.KL_nondiagonal(inshape=list(spatial), prior_lambda=20)
    ref = ref_kl.loss(None, None, to_torch(mu), to_torch(sigma)).item()
    got = float(jl.kl_nondiagonal(mu, sigma, prior_lambda=20.0))
    np.testing.assert_allclose(got, ref, rtol=1e-4)


@pytest.mark.parametrize("shape", [(3, 7, 9, 1), (2, 5, 6, 7, 1)])
def test_l2_loss(shape):
    a, b = rand(shape, 16), rand(shape, 17)
    ref = ref_losses.L2_loss(to_torch(a), to_torch(b)).item()
    got = float(jl.l2_loss(a, b))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


@pytest.mark.parametrize("shape,win", [
    ((2, 12, 14, 1), 9),
    ((1, 10, 11, 1), 5),
    ((1, 8, 9, 10, 1), 3),
    ((2, 9, 10, 11, 1), 7),
])
def test_ncc_loss(shape, win):
    a, b = rand(shape, 18), rand(shape, 19)
    ref = ref_losses.NCC_loss(to_torch(a), to_torch(b), win_size=win, gamma=0.05).item()
    got = float(jl.ncc_loss(a, b, win_size=win, gamma=0.05))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("shape", [(2, 6, 7, 4), (1, 5, 6, 7, 3)])
def test_soft_dice(shape):
    a = np.abs(rand(shape, 20))
    b = (np.abs(rand(shape, 21)) > 0.8).astype(np.float32)
    ref = ref_losses.Soft_dice_loss(to_torch(a), to_torch(b), dice_factor=50).item()
    got = float(jl.soft_dice_loss(a, b, dice_factor=50))
    np.testing.assert_allclose(got, ref, rtol=1e-4)


@pytest.mark.parametrize("spatial,normalize", [
    ((8, 9), True), ((8, 9), False), ((6, 7, 8), True), ((6, 7, 8), False),
])
def test_jacobian_det(spatial, normalize):
    nd = len(spatial)
    df = 2.0 * rand((2, *spatial, nd), 22)
    ref = ref_losses.jacobian_det(to_torch(df), normalize=normalize).detach().numpy()
    got = np.asarray(jl.jacobian_det(df, normalize=normalize))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize("spatial", [(8, 9), (6, 7, 8)])
def test_jdet_std(spatial):
    nd = len(spatial)
    df = 2.0 * rand((1, *spatial, nd), 23)
    ref = ref_losses.JDetStd(to_torch(df), lamb=0.7).item()
    got = float(jl.jdet_std(df, lamb=0.7))
    np.testing.assert_allclose(got, ref, rtol=1e-4)


@pytest.mark.parametrize("spatial", [(8, 9), (6, 7, 8)])
def test_l2_reg(spatial):
    nd = len(spatial)
    df = rand((2, *spatial, nd), 24)
    ref = ref_losses.L2_reg(to_torch(df), lamb=0.025).item()
    got = float(jl.l2_reg(df, lamb=0.025))
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_hierarchical_recon_matches_reference():
    cfg = PULPoConfig(input_size=(16, 18), total_levels=3, latent_levels=2, n0=2)
    y = rand((2, 16, 18, 1), 25)
    y_hat = {0: rand((2, 16, 18, 1), 26), 1: rand((2, 8, 9, 1), 27)}
    ref_mod = ref_losses.HierarchicalReconstructionLoss(
        recon_loss=["ncc", "mse"],
        weight_dict=dict(cfg.recon_weight_dict),
        similarity_pyramid=False,
        ndims=2,
        window_size=dict(cfg.window_size),
    )
    ref_total, ref_levels = ref_mod(
        {k: to_torch(v) for k, v in y_hat.items()}, to_torch(y), gamma=0.05
    )
    total, levels = jl.hierarchical_reconstruction_loss(
        y_hat, y, cfg.recon_weight_dict, ("ncc", "mse"), cfg.window_size, gamma=0.05
    )
    # f32 box-sum accumulation order differs (reduce_window vs conv)
    np.testing.assert_allclose(float(total), ref_total.item(), rtol=5e-4)
    for l in levels:
        np.testing.assert_allclose(float(levels[l]), ref_levels[l].item(), rtol=5e-4)


def test_weight_dicts_match_reference_formulas():
    """models.py:104-123 weight math for the default 3D config."""
    cfg = PULPoConfig(input_size=(160, 192, 224), total_levels=5, latent_levels=4)
    assert cfg.window_size == {0: 9, 1: 7, 2: 5, 3: 3}
    assert cfg.kl_weight_dict == {0: 1.0, 1: 8.0, 2: 64.0, 3: 512.0}
    # recon: scale_dict with level0 -> 1/2**(3*1), then *4
    assert cfg.recon_weight_dict == {0: 4.0 / 8.0, 1: 8.0, 2: 64.0, 3: 512.0}
    assert cfg.regularization_weight_dict == {0: 1.0 / 8.0, 1: 8.0, 2: 64.0, 3: 512.0}
    assert cfg.level_sizes == {
        0: (80, 96, 112), 1: (40, 48, 56), 2: (20, 24, 28), 3: (10, 12, 14)}


def test_similarity_pyramid_weights():
    """similarity_pyramid divides each level weight by 2**l
    (losses.py:238-240, applied in all three hierarchical wrappers)."""
    cfg = PULPoConfig(input_size=(160, 192, 224), similarity_pyramid=True)
    base = PULPoConfig(input_size=(160, 192, 224))
    for l in range(cfg.latent_levels):
        assert cfg.kl_weight_dict[l] == base.kl_weight_dict[l] / 2**l
        assert cfg.recon_weight_dict[l] == base.recon_weight_dict[l] / 2**l


def test_window_size_special_cases():
    """window_size formula for K != 4, incl. the K == 1 special case
    (models.py:104-106)."""
    mk = lambda K, L: PULPoConfig(
        input_size=(64, 64, 64), total_levels=L, latent_levels=K)
    assert mk(1, 2).window_size == {0: 9}     # special-cased, not 1+2*1
    assert mk(2, 3).window_size == {0: 5, 1: 3}
    assert mk(3, 4).window_size == {0: 7, 1: 5, 2: 3}
    assert mk(5, 6).window_size == {0: 11, 1: 9, 2: 7, 3: 5, 4: 3}
    # recon/reg weight scaling follows latent_levels, not 4
    cfg = mk(2, 3)
    assert cfg.kl_weight_dict == {0: 1.0, 1: 8.0}
    assert cfg.recon_weight_dict == {0: 4.0 / 8.0, 1: 8.0}


def test_floor_vs_ceil_level_sizes():
    """models.py:69 floor-divides the input size per level while the
    activations follow ceil-mode pooling (pulpo.py:93-96); they disagree
    on odd intermediate dims. floor_level_sizes feeds only the
    nondiagonal-KL inshape."""
    cfg = PULPoConfig(input_size=(84, 90, 104), total_levels=4, latent_levels=3)
    # ceil chain: 84 -> 42 -> 21 -> 11 ; floor: 84//2, 84//4, 84//8
    assert cfg.level_sizes == {0: (42, 45, 52), 1: (21, 23, 26), 2: (11, 12, 13)}
    assert cfg.floor_level_sizes == {0: (42, 45, 52), 1: (21, 22, 26), 2: (10, 11, 13)}
    assert cfg.level_sizes[1] != cfg.floor_level_sizes[1]

    # the nondiagonal KL normalization uses the *actual* posterior shape
    # (DIVERGENCES.md #4): identical to the reference on even sizes
    even = PULPoConfig(input_size=(64, 64, 64), total_levels=3, latent_levels=2)
    assert even.level_sizes == even.floor_level_sizes
