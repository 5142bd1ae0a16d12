"""Channels-first (CF) df pipeline vs the channels-last reference path.

Round-5 PERF lever 1: fields stay in the Pallas kernels' native
channels-first tile-padded layouts between VecInt / cascade-warp calls.
Every CF branch must BIT-match its channels-last counterpart (same
math, same order, only the staging differs) — these tests pin that on
CPU interpret mode, including the finite-garbage-pads invariant of the
chained layout-A kernel.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pulpo_tpu.kernels.warp_halo import (
    halo_bad_mask,
    halo_bad_mask_cf,
    halo_bound_ok,
    halo_bound_ok_cf,
    warp_cascaded,
    warp_cascaded_cf,
    warp_cascaded_cf_image,
    mov_to_cf,
    squaring_beyond_cf,
)
from pulpo_tpu.kernels.warp_local import (
    _squaring_step_cf_pallas,
    _squaring_step_pallas,
    _squaring_step_xla,
    cf_interior,
    cf_layout,
    cf_pad,
    cf_unpad,
    integrate_svf_cf,
    local_bound,
)
from pulpo_tpu.ops.warp import (
    integrate_svf,
    resize_vecfield,
    resize_vecfield_cf,
    warp_image,
)

SHAPE = (16, 24, 28)  # >= MIN_PALLAS_VOXELS, roomy enough for H=3 tiers


def _field(mag: float, shape=SHAPE, b: int = 2, seed: int = 0):
    k = jax.random.key(seed)
    return mag * jax.random.normal(k, (b, *shape, 3), jnp.float32)


class TestCFLayout:
    def test_pad_unpad_roundtrip(self):
        v = _field(0.3)
        vp = cf_pad(v)
        assert vp.shape == (2, 3, *cf_layout(SHAPE))
        np.testing.assert_array_equal(cf_unpad(vp, SHAPE), v)
        # pads are exactly zero
        mask = np.ones(vp.shape, bool)
        S0, S1, S2 = SHAPE
        mask[:, :, 1:S0 + 1, 1:S1 + 1, 1:S2 + 1] = False
        np.testing.assert_array_equal(np.asarray(vp)[mask], 0.0)

    def test_interior_view(self):
        v = _field(0.3)
        vp = cf_pad(v)
        got = cf_interior(vp, SHAPE)
        np.testing.assert_array_equal(
            got, jnp.transpose(v, (0, 4, 1, 2, 3)))


class TestCFSquaringStep:
    def test_cf_kernel_matches_cl_kernel(self):
        bound = local_bound(SHAPE)
        v = _field(0.8 * bound)
        want = _squaring_step_pallas(v, interpret=True)
        got_p = _squaring_step_cf_pallas(cf_pad(v), SHAPE, interpret=True)
        np.testing.assert_array_equal(cf_unpad(got_p, SHAPE), want)

    def test_cf_kernel_chain_garbage_pads_exact(self):
        """Two chained CF steps: step 2 consumes step 1's raw output
        (finite-garbage z pad planes) and must still bit-match."""
        bound = local_bound(SHAPE)
        v = _field(0.4 * bound)
        vp = _squaring_step_cf_pallas(cf_pad(v), SHAPE, interpret=True)
        got = _squaring_step_cf_pallas(vp, SHAPE, interpret=True)
        want = _squaring_step_pallas(
            _squaring_step_pallas(v, interpret=True), interpret=True)
        np.testing.assert_array_equal(cf_unpad(got, SHAPE), want)

    @pytest.mark.parametrize("mag_rel", [0.5, 1.8, 3.5])
    def test_beyond_branch_matches_tiered(self, mag_rel):
        """squaring_beyond_cf == v + warp_cascaded(v, v) at magnitudes
        hitting the H=2 tier, the H=3 tier and the repair ladder."""
        bound = local_bound(SHAPE)
        v = _field(mag_rel * bound, seed=3)
        want = v + warp_cascaded(v, v, halos=(2, 3), interpret=True)
        got = squaring_beyond_cf(cf_pad(v), SHAPE, (2, 3), interpret=True)
        np.testing.assert_allclose(
            cf_unpad(got, SHAPE), want, rtol=0, atol=0)

    @pytest.mark.parametrize("mag_rel", [0.3, 1.5, 3.0])
    def test_integrate_cf_bitmatches_cl_chain(self, mag_rel):
        """CF chain == channels-last Pallas chain BIT-FOR-BIT (same
        kernels via _step_accumulate / the shared cascade, only the
        staging differs)."""
        from jax.experimental.pallas import tpu as pltpu

        from pulpo_tpu.kernels.warp_local import integrate_svf_pallas

        bound = local_bound(SHAPE)
        v = _field(mag_rel * bound * 8, seed=5)  # pre-scaling magnitude
        with pltpu.force_tpu_interpret_mode():
            want = integrate_svf_pallas(v, nsteps=4)
        got = integrate_svf_cf(v, 4, True)
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("mag_rel", [0.3, 1.5])
    def test_integrate_cf_matches_xla_semantics(self, mag_rel):
        """vs the pure XLA gather composition: equal up to f32
        accumulation order of the stencil taps."""
        bound = local_bound(SHAPE)
        v = _field(mag_rel * bound * 8, seed=5)
        want = integrate_svf(v, nsteps=4)
        got = integrate_svf_cf(v, 4, True)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_integrate_cf_grad_safety_net(self):
        """The (unexpected) backward replays the CL chain — finite and
        close to the XLA vjp."""
        v = _field(0.2, b=1, shape=(16, 16, 16), seed=7)
        g_cf = jax.grad(
            lambda u: jnp.sum(jnp.sin(integrate_svf_cf(u, 2, True))))(v)
        g_cl = jax.grad(
            lambda u: jnp.sum(jnp.sin(integrate_svf(u, 2))))(v)
        np.testing.assert_allclose(g_cf, g_cl, rtol=1e-5, atol=1e-5)


class TestCFCascade:
    @pytest.mark.parametrize("mag", [0.8, 2.0, 4.0, 8.0])
    def test_guards_match_cl(self, mag):
        df = _field(mag, seed=11)
        dcf = cf_pad(df)
        for h in (2, 3):
            np.testing.assert_array_equal(
                halo_bound_ok_cf(dcf, SHAPE, 1, h), halo_bound_ok(df, h))
            np.testing.assert_array_equal(
                halo_bad_mask_cf(dcf, SHAPE, 1, h), halo_bad_mask(df, h))

    @pytest.mark.parametrize("mag", [0.9, 2.0, 2.8, 6.0])
    def test_cascade_cf_matches_cl_every_tier(self, mag):
        """Stencil tiers, repair ladder and terminal gather all
        bit-match warp_cascaded (layout-A df, c=3 self-warp shape)."""
        df = _field(mag, seed=13)
        mov = _field(1.0, seed=17)  # any 3-channel "image"
        want = warp_cascaded(mov, df, halos=(2, 3), interpret=True)
        from pulpo_tpu.kernels.warp_halo import _repad_layoutA_for_halo

        mp = _repad_layoutA_for_halo(cf_pad(mov), SHAPE, 3)
        got = warp_cascaded_cf(mp, cf_pad(df), spatial=SHAPE, c=3,
                               b_mov=2, moff=3, doff=1, halos=(2, 3),
                               interpret=True)
        np.testing.assert_allclose(
            jnp.transpose(got, (0, 2, 3, 4, 1)), want, rtol=0, atol=0)

    @pytest.mark.parametrize("mag", [0.9, 2.8, 6.0])
    def test_image_warp_cf_matches_cl(self, mag):
        """resize-native df layout (doff=0) + C=1 image, sample-tiled
        df batch — the decode's batched post-loop warp shape."""
        img = jnp.abs(_field(1.0, seed=19))[..., :1]  # (2, *sp, 1)
        df = _field(mag, b=4, seed=23)  # 2 samples x 2 pairs
        want = warp_cascaded(img, df, halos=(2, 3), interpret=True)
        # build the doff=0 padded CF layout the resize emits
        from pulpo_tpu.kernels.warp_local import _round_up

        S0, S1, S2 = SHAPE
        dcf = jnp.transpose(df, (0, 4, 1, 2, 3))
        dcf = jnp.pad(dcf, ((0, 0), (0, 0), (0, 0),
                            (0, _round_up(S1, 8) - S1),
                            (0, _round_up(S2, 128) - S2)))
        got = warp_cascaded_cf_image(img, dcf, SHAPE, doff=0,
                                     interpret=True)
        np.testing.assert_allclose(got, want, rtol=0, atol=0)

    def test_mov_to_cf_layout(self):
        img = _field(1.0, seed=29)[..., :1]
        mp = mov_to_cf(img, 2)
        # interior at offset (2,2,2), value-preserving
        S0, S1, S2 = SHAPE
        np.testing.assert_array_equal(
            mp[:, 0, 2:S0 + 2, 2:S1 + 2, 2:S2 + 2], img[..., 0])


class TestCFResize:
    @pytest.mark.parametrize("scale", [2.0, 4.0, 0.5, 1.0])
    def test_matches_cl_resize(self, scale):
        v = _field(1.0, shape=(8, 12, 14), b=2, seed=31)
        out_size = tuple(int(s * scale) for s in (8, 12, 14))
        vel_resize = 1.0 / scale
        want = resize_vecfield(v, vel_resize, out_size=out_size)
        got = resize_vecfield_cf(jnp.transpose(v, (0, 4, 1, 2, 3)),
                                 vel_resize, out_size)
        S0, S1, S2 = out_size
        got_cl = jnp.transpose(got[:, :, :, :S1, :S2], (0, 2, 3, 4, 1))
        np.testing.assert_allclose(got_cl, want, rtol=0, atol=1e-6)
        # tile pads are exactly zero
        pads = np.asarray(got[:, :, :, S1:, :])
        np.testing.assert_array_equal(pads, 0.0)
        pads = np.asarray(got[:, :, :, :, S2:])
        np.testing.assert_array_equal(pads, 0.0)


class TestCFModelPath:
    """Full decode + UQ with PULPO_CF_PIPELINE=interpret vs the default
    path — the composed routing the bench flips on."""

    @pytest.fixture()
    def small_model(self):
        from pulpo_tpu.config import PULPoConfig
        from pulpo_tpu.models.api import PULPoModel

        cfg = PULPoConfig(input_size=(16, 24, 28), total_levels=3,
                          latent_levels=2, n0=4, dataset="synthetic")
        model = PULPoModel(cfg)
        variables = model.init(jax.random.key(0))
        x = jax.random.uniform(jax.random.key(1), (2, 16, 24, 28, 1))
        y = jax.random.uniform(jax.random.key(2), (2, 16, 24, 28, 1))
        return model, variables, x, y

    def test_uq_cf_matches_default(self, small_model, monkeypatch):
        from pulpo_tpu.uq.predict import _uq_impl

        model, variables, x, y = small_model
        rng = jax.random.key(3)
        monkeypatch.delenv("PULPO_CF_PIPELINE", raising=False)
        base = _uq_impl(model, variables, x, y, 4, rng, chunk=2)
        monkeypatch.setenv("PULPO_CF_PIPELINE", "interpret")
        got = _uq_impl(model, variables, x, y, 4, rng, chunk=2)
        for name in base._fields:
            b, g = getattr(base, name), getattr(got, name)
            if b is None:
                assert g is None
                continue
            for l in b:
                np.testing.assert_allclose(
                    np.asarray(g[l], np.float32),
                    np.asarray(b[l], np.float32),
                    rtol=2e-5, atol=2e-5,
                    err_msg=f"{name}[{l}]")

    def test_uq_cf_keep_samples_and_lm(self, small_model, monkeypatch):
        from pulpo_tpu.uq.predict import _uq_impl

        model, variables, x, y = small_model
        rng = jax.random.key(4)
        lm = jnp.array([[[3.0, 5.0, 7.0], [8.0, 2.0, 9.0]]] * 2)
        base = _uq_impl(model, variables, x, y, 4, rng, chunk=2,
                        keep_samples=True, lm=lm)
        monkeypatch.setenv("PULPO_CF_PIPELINE", "interpret")
        got = _uq_impl(model, variables, x, y, 4, rng, chunk=2,
                       keep_samples=True, lm=lm)
        np.testing.assert_allclose(got.sample_landmarks,
                                   base.sample_landmarks,
                                   rtol=2e-5, atol=2e-5)
        for l in base.sample_final_dfs:
            np.testing.assert_allclose(got.sample_final_dfs[l],
                                       base.sample_final_dfs[l],
                                       rtol=2e-5, atol=2e-5)
