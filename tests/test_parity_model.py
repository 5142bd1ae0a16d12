"""Full-model parity: reference torch network vs ours with ported weights.

Builds the reference's DownPath + Autoencoder directly (they import
without Lightning), runs a deterministic eval-mode forward, ports the
state_dict into our flax model via pulpo_tpu.compat, and compares every
intermediate per level. This is the strongest end-to-end numerics check
we have short of training parity.
"""

import sys

import numpy as np
import pytest
import torch

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

ref_pulpo = pytest.importorskip("src.components.pulpo", reason="reference not mounted")

import jax  # noqa: E402

from pulpo_tpu.compat import import_torch_state_dict  # noqa: E402
from pulpo_tpu.config import PULPoConfig  # noqa: E402
from pulpo_tpu.models.api import PULPoModel  # noqa: E402


class RefNet(torch.nn.Module):
    """DownPath + Autoencoder exactly as PULPo wires them
    (src/models.py:76-94)."""

    def __init__(self, cfg: PULPoConfig):
        super().__init__()

        # The reference's "deterministic" mode still draws random z for
        # the *feedback* path (pulpo.py:187-209: the samples dict is
        # always gauss_sampler output; only the decoder input switches
        # to mu). Our build uses mu everywhere in deterministic mode
        # (documented divergence) — inject the same semantics here so
        # the comparison is RNG-free.
        def mu_sampler(mu, sigma, var=1):
            return mu

        self.downpath = ref_pulpo.DownPath(
            total_levels=cfg.total_levels,
            latent_levels=cfg.latent_levels,
            input_size=list(cfg.input_size),
            input_channels=2,
            n0=cfg.n0,
        )
        self.autoencoder = ref_pulpo.Autoencoder(
            sampler=mu_sampler,
            decoder="SVF",
            total_levels=cfg.total_levels,
            latent_levels=cfg.latent_levels,
            zdim=cfg.ndims,
            input_size=list(cfg.input_size),
            feedback=list(cfg.feedback),
            df_resolution=cfg.df_resolution,
            n0=cfg.n0,
            cp_depth=cfg.cp_depth,
        )

    def forward(self, x, y):
        acts = self.downpath(x, y)
        return self.autoencoder(x, acts, deterministic=True)


def to_torch(x_last):
    nd = x_last.ndim - 2
    perm = (0, x_last.ndim - 1) + tuple(range(1, 1 + nd))
    return torch.from_numpy(np.transpose(x_last, perm).copy())


def to_last(t):
    nd = t.ndim - 2
    perm = (0,) + tuple(range(2, 2 + nd)) + (1,)
    return np.transpose(t.detach().numpy(), perm)


@pytest.mark.parametrize("df_resolution", ["level_res", "full_res"])
def test_deterministic_forward_parity(df_resolution):
    # sizes divisible by 2^(L-1): the reference crashes on odd level
    # sizes (its x2 upscale mismatches ceil-mode pooling; SURVEY.md §7)
    cfg = PULPoConfig(
        input_size=(16, 24, 32), total_levels=3, latent_levels=2, n0=2,
        df_resolution=df_resolution, dataset="synthetic",
    )
    torch.manual_seed(0)
    ref = RefNet(cfg)
    # perturb running stats so BatchNorm eval mode is a real check
    with torch.no_grad():
        for m in ref.modules():
            if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.6, 1.5)
    ref.eval()

    variables = import_torch_state_dict(ref.state_dict(), cfg)
    model = PULPoModel(cfg)
    # structural check: imported tree matches a fresh init exactly
    init_vars = jax.device_get(model.init(jax.random.key(0)))
    fresh = jax.tree.structure(init_vars)
    ported = jax.tree.structure(jax.device_get(variables))
    assert fresh == ported, f"\n{fresh}\nvs\n{ported}"

    rng = np.random.default_rng(0)
    x = rng.random((1, *cfg.input_size, 1), dtype=np.float32)
    y = rng.random((1, *cfg.input_size, 1), dtype=np.float32)

    with torch.no_grad():
        r_mus, r_sigmas, _, r_vf, r_ind, r_comb, r_final, r_trans = ref(
            to_torch(x), to_torch(y)
        )

    outs = model.apply_eval(variables, x, y, deterministic=True)
    j_mus, j_sigmas, _, j_vf, j_ind, j_comb, j_final, j_trans = outs

    for l in range(cfg.latent_levels):
        np.testing.assert_allclose(
            np.asarray(j_mus[l]), to_last(r_mus[l]), rtol=1e-4, atol=1e-5,
            err_msg=f"mu level {l}")
        np.testing.assert_allclose(
            np.asarray(j_sigmas[l]), to_last(r_sigmas[l]), rtol=1e-4, atol=1e-5,
            err_msg=f"sigma level {l}")
        np.testing.assert_allclose(
            np.asarray(j_ind[l]), to_last(r_ind[l]), rtol=1e-3, atol=1e-5,
            err_msg=f"individual df level {l}")
        np.testing.assert_allclose(
            np.asarray(j_comb[l]), to_last(r_comb[l]), rtol=1e-3, atol=1e-5,
            err_msg=f"combined df level {l}")
        np.testing.assert_allclose(
            np.asarray(j_final[l]), to_last(r_final[l]), rtol=1e-3, atol=1e-4,
            err_msg=f"final df level {l}")
        np.testing.assert_allclose(
            np.asarray(j_trans[l]), to_last(r_trans[l]), rtol=1e-3, atol=1e-4,
            err_msg=f"transformed level {l}")
