"""Pallas kernel tests (interpret mode on CPU) vs XLA references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pulpo_tpu.kernels.box_sum import _box_sum_xla, box_sum_nd


@pytest.mark.parametrize("shape,win", [
    ((2, 16, 24), 9),
    ((1, 8, 130), 5),
    ((2, 6, 16, 24), 3),
    ((1, 10, 12, 14), 7),
])
def test_box_sum_interpret_matches_xla(shape, win):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    ref = _box_sum_xla(x, win)
    got = box_sum_nd(x, win, impl="interpret")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_box_sum_gradient_self_adjoint():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 8, 10, 12)).astype(np.float32))

    # small values: sin() of large box sums amplifies f32 noise
    x = x * 0.01
    f_int = lambda v: jnp.sum(jnp.sin(box_sum_nd(v, 5, impl="interpret")))
    f_xla = lambda v: jnp.sum(jnp.sin(box_sum_nd(v, 5, impl="xla")))
    g_int = jax.grad(f_int)(x)
    g_xla = jax.grad(f_xla)(x)
    np.testing.assert_allclose(np.asarray(g_int), np.asarray(g_xla),
                               rtol=1e-4, atol=1e-5)


class TestWarpLocal:
    """The 27-tap halo stencil must bit-match the XLA self-warp while
    the sub-voxel exactness bound holds."""

    def _random_subvoxel_field(self, shape, scale, seed=0):
        from pulpo_tpu.kernels.warp_local import local_bound

        rng = np.random.default_rng(seed)
        v = rng.uniform(-1, 1, size=shape).astype(np.float32)
        return jnp.asarray(v * scale * local_bound(shape[1:-1]))

    @pytest.mark.parametrize("shape", [
        (1, 10, 12, 14, 3),
        (2, 8, 9, 11, 3),   # odd sizes exercise slab/halo edges
        (1, 12, 14, 2),     # 2D
    ])
    def test_stencil_matches_xla_selfwarp(self, shape):
        from pulpo_tpu.kernels.warp_local import _squaring_step_pallas
        from pulpo_tpu.ops.warp import warp_image

        vec = self._random_subvoxel_field(shape, scale=0.999)
        ref = vec + warp_image(vec, vec)
        got = _squaring_step_pallas(vec, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

    def test_guarded_integration_matches_xla(self):
        """Full 7-step integration (guard flips to the XLA branch as the
        field grows) == ops.warp.integrate_svf."""
        from jax.experimental.pallas import tpu as pltpu

        from pulpo_tpu.kernels.warp_local import integrate_svf_pallas
        from pulpo_tpu.ops.warp import integrate_svf

        rng = np.random.default_rng(3)
        # a *large* field: after /2^7 it is sub-voxel for the first
        # iterations, then crosses the bound -> exercises both branches
        vec = jnp.asarray(
            rng.uniform(-20, 20, size=(1, 10, 12, 14, 3)).astype(np.float32))
        ref = integrate_svf(vec, nsteps=7)
        with pltpu.force_tpu_interpret_mode():
            got = integrate_svf_pallas(vec, nsteps=7)
        # early-step f32 noise (~1e-7) doubles per squaring iteration;
        # field magnitudes reach ~14 voxels -> tolerance scaled to match
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-3)

    def test_gradient_matches_xla(self):
        from jax.experimental.pallas import tpu as pltpu

        from pulpo_tpu.kernels.warp_local import squaring_step
        from pulpo_tpu.ops.warp import warp_image

        vec = self._random_subvoxel_field((1, 6, 8, 10, 3), scale=0.9, seed=4)
        f_ref = lambda v: jnp.sum(jnp.cos(v + warp_image(v, v)))
        f_ker = lambda v: jnp.sum(jnp.cos(squaring_step(v)))
        g_ref = jax.grad(f_ref)(vec)
        with pltpu.force_tpu_interpret_mode():
            g_ker = jax.grad(f_ker)(vec)
        np.testing.assert_allclose(np.asarray(g_ker), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-5)

    def test_zero_field_is_fixed_point(self):
        from pulpo_tpu.kernels.warp_local import _squaring_step_pallas

        vec = jnp.zeros((1, 6, 8, 10, 3), jnp.float32)
        got = _squaring_step_pallas(vec, interpret=True)
        np.testing.assert_allclose(np.asarray(got), 0.0, atol=1e-7)

    @pytest.mark.parametrize("mag", [0.3, 1.2, 2.2, 4.0, 8.0])
    def test_tiered_step_matches_xla_all_magnitudes(self, mag):
        """_squaring_step_tiered == the XLA self-warp at every
        displacement regime: sub-voxel (fused 27-tap), each halo tier
        (H=2/3/5 via warp_cascaded), and past all tiers (repair ladder /
        gather fallback). Shape above MIN_PALLAS_VOXELS so the tiered
        path is actually taken."""
        from pulpo_tpu.kernels.warp_local import _squaring_step_tiered
        from pulpo_tpu.ops.warp import warp_image

        shape = (1, 20, 24, 28, 3)  # 13k voxels >= MIN_PALLAS_VOXELS
        rng = np.random.default_rng(11)
        v = rng.uniform(-1, 1, size=shape).astype(np.float32)
        v *= mag / np.abs(v).max()
        vec = jnp.asarray(v)
        ref = vec + warp_image(vec, vec)
        got = _squaring_step_tiered(vec, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_tiered_integration_matches_xla_above_threshold(self):
        """7-step integration of a large field at a >=MIN_PALLAS_VOXELS
        shape: late squaring steps cross into the halo tiers (the hot
        path probe_decode_bisect found) and must still match
        ops.warp.integrate_svf."""
        from jax.experimental.pallas import tpu as pltpu

        from pulpo_tpu.kernels.warp_local import integrate_svf_pallas
        from pulpo_tpu.ops.warp import integrate_svf

        rng = np.random.default_rng(12)
        vec = jnp.asarray(
            rng.uniform(-8, 8, size=(1, 20, 24, 28, 3)).astype(np.float32))
        ref = integrate_svf(vec, nsteps=7)
        with pltpu.force_tpu_interpret_mode():
            got = integrate_svf_pallas(vec, nsteps=7)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-3)

    @pytest.mark.parametrize("shape", [
        (1, 10, 12, 14, 3),
        (2, 8, 9, 11, 3),  # odd sizes exercise slab/halo edges
    ])
    def test_bwd_stencil_matches_xla_vjp(self, shape):
        """The Pallas transpose stencil (data + coordinate + identity
        terms) must match jax.vjp through the XLA composition for
        sub-voxel fields."""
        from pulpo_tpu.kernels.warp_local import (
            _squaring_step_bwd_pallas, _squaring_step_xla)

        vec = self._random_subvoxel_field(shape, scale=0.95, seed=11)
        rng = np.random.default_rng(12)
        g = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        _, vjp = jax.vjp(_squaring_step_xla, vec)
        ref = vjp(g)[0]
        got = _squaring_step_bwd_pallas(vec, g, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_bwd_stencil_boundary_clamp(self):
        """Fields pushing samples into the border clamp region still
        agree (the clip mask zeroes the coordinate term there)."""
        from pulpo_tpu.kernels.warp_local import (
            _squaring_step_bwd_pallas, _squaring_step_xla, local_bound)

        shape = (1, 8, 10, 12, 3)
        b = local_bound(shape[1:-1])
        # constant field at ~the bound drives edge voxels into clamping
        vec = jnp.full(shape, 0.98 * b, jnp.float32)
        rng = np.random.default_rng(13)
        g = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        _, vjp = jax.vjp(_squaring_step_xla, vec)
        ref = vjp(g)[0]
        got = _squaring_step_bwd_pallas(vec, g, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


def test_ncc_uses_kernel_and_matches_golden():
    """ncc_loss routed through box_sum_nd still matches torch (the torch
    golden path is covered in test_losses; here interpret vs xla)."""
    from pulpo_tpu.ops.losses import ncc_loss

    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.standard_normal((2, 10, 12, 14, 1)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((2, 10, 12, 14, 1)).astype(np.float32))
    v1 = float(ncc_loss(a, b, win_size=5))
    # grad flows
    g = jax.grad(lambda p: ncc_loss(p, b, win_size=5))(a)
    assert np.isfinite(np.asarray(g)).all()
    assert np.isfinite(v1)


class TestWarpHalo:
    """The generalized halo-H warp stencil must match the XLA gather
    warp whenever the per-axis source-offset bound holds."""

    def _field(self, shape, mag, seed=0):
        rng = np.random.default_rng(seed)
        return jnp.asarray(
            rng.uniform(-mag, mag, size=shape).astype(np.float32))

    @pytest.mark.parametrize("shape,c,halo", [
        ((1, 10, 12, 14), 1, 2),
        ((2, 8, 9, 11), 3, 2),    # odd sizes exercise slab/halo edges
        ((1, 12, 16, 130), 1, 3), # lane-dim > 128 tile
        ((1, 12, 14, 16), 1, 4),  # taps > 8: recompute-wy kernel path
    ])
    def test_matches_xla_warp(self, shape, c, halo):
        from pulpo_tpu.kernels.warp_halo import _warp_halo_pallas, halo_bound_ok
        from pulpo_tpu.ops.warp import warp_image

        mov = self._field(shape + (c,), 1.0, seed=1)
        df = self._field(shape + (3,), halo - 1.2, seed=2)
        assert bool(halo_bound_ok(df, halo))
        ref = warp_image(mov, df)
        got = _warp_halo_pallas(mov, df, halo, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_sample_tiled_df_batch(self):
        """df batch = S x moving batch: row b' reads moving row b' % B."""
        from pulpo_tpu.kernels.warp_halo import _warp_halo_pallas
        from pulpo_tpu.ops.warp import warp_image

        mov = self._field((2, 8, 10, 12, 1), 1.0, seed=3)
        df = self._field((6, 8, 10, 12, 3), 0.8, seed=4)
        ref = warp_image(mov, df)
        got = _warp_halo_pallas(mov, df, 2, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_border_clamp_large_positive_coords(self):
        """Displacements pushing src past the high border clamp onto the
        border voxel (grid_sample border padding), staying in-bound for
        the stencil's high-side taps."""
        from pulpo_tpu.kernels.warp_halo import _warp_halo_pallas, halo_bound_ok
        from pulpo_tpu.ops.warp import warp_image

        mov = self._field((1, 8, 10, 12, 1), 1.0, seed=5)
        df = jnp.full((1, 8, 10, 12, 3), 0.9, jnp.float32)
        assert bool(halo_bound_ok(df, 2))
        ref = warp_image(mov, df)
        got = _warp_halo_pallas(mov, df, 2, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("halo", [2, 3])
    def test_zloop_structure_bit_exact(self, halo, monkeypatch):
        """The internal-z-loop kernel structure (grid over rows, z-slab
        walk in-kernel with manual output DMA) must be bit-identical to
        the per-slab-grid structure for forward AND df-cotangent: same
        tap math via the shared accumulate helpers."""
        from pulpo_tpu.kernels.warp_halo import (
            _warp_halo_pallas, _warp_halo_dfgrad_pallas)

        mov = self._field((2, 12, 10, 14, 2), 1.0, seed=7)
        df = self._field((4, 12, 10, 14, 3), 1.2, seed=8)
        g = self._field((4, 12, 10, 14, 2), 1.0, seed=9)

        monkeypatch.setenv("PULPO_WARP_ZLOOP", "0")
        f0 = _warp_halo_pallas(mov, df, halo, interpret=True)
        d0 = _warp_halo_dfgrad_pallas(mov, df, g, halo, interpret=True)
        monkeypatch.setenv("PULPO_WARP_ZLOOP", "1")
        f1 = _warp_halo_pallas(mov, df, halo, interpret=True)
        d1 = _warp_halo_dfgrad_pallas(mov, df, g, halo, interpret=True)

        np.testing.assert_array_equal(np.asarray(f1), np.asarray(f0))
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d0))

    def test_guard_rejects_oversized_displacement(self):
        from pulpo_tpu.kernels.warp_halo import halo_bound_ok

        # note: displacements past the HIGH border are forgiven by the
        # border clamp (clip(src) is what the stencil samples), so the
        # probe displacement points INWARD from near the high border
        df = jnp.zeros((1, 8, 10, 12, 3), jnp.float32)
        df = df.at[0, 6, 5, 6, 0].set(-5.0)
        assert not bool(halo_bound_ok(df, 2))
        assert bool(halo_bound_ok(df, 6))

    def test_gradient_matches_xla(self):
        """custom_vjp must route gradients through the XLA composition
        regardless of which forward branch would run."""
        from pulpo_tpu.kernels.warp_halo import warp_halo_guarded
        from pulpo_tpu.ops.warp import warp_image

        mov = self._field((1, 6, 8, 10, 1), 1.0, seed=6)
        df = self._field((1, 6, 8, 10, 3), 0.5, seed=7)
        g_ref = jax.grad(lambda m, d: jnp.sum(warp_image(m, d) ** 2), (0, 1))(
            mov, df)
        g_got = jax.grad(
            lambda m, d: jnp.sum(warp_halo_guarded(m, d, 2, True) ** 2),
            (0, 1))(mov, df)
        for a, b in zip(g_got, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("mag,hit_tier", [
        (1.0, "halo2"),   # within tier 1
        (2.8, "halo4"),   # exceeds tier 1, within tier 2
        (9.0, "xla"),     # exceeds every tier -> exact gather fallback
    ])
    def test_cascade_matches_xla_at_every_tier(self, mag, hit_tier):
        """warp_cascaded must equal the reference gather whichever tier
        the runtime guards select (small tiers for near-identity SVF
        dfs, big tiers for trained-model deformations, XLA beyond)."""
        from pulpo_tpu.kernels.warp_halo import halo_bound_ok, warp_cascaded
        from pulpo_tpu.ops.warp import warp_image

        shape = (1, 12, 14, 16)
        mov = self._field(shape + (1,), 1.0, seed=8)
        rng = np.random.default_rng(9)
        # inward-pointing displacements so the high-border clamp cannot
        # forgive the magnitude (see test_guard_rejects_oversized...)
        df = jnp.asarray(
            (rng.uniform(0.3, 1.0, size=shape + (3,)) * mag).astype(
                np.float32)) * jnp.asarray([-1.0, 1.0, -1.0])
        tiers = {"halo2": (True, None), "halo4": (False, True),
                 "xla": (False, False)}
        want2, want4 = tiers[hit_tier]
        assert bool(halo_bound_ok(df, 2)) == want2
        if want4 is not None:
            assert bool(halo_bound_ok(df, 4)) == want4
        ref = warp_image(mov, df)
        got = warp_cascaded(mov, df, halos=(2, 4), interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("shape,c,halo", [
        ((1, 10, 12, 14), 1, 2),
        ((2, 8, 9, 11), 3, 2),
        ((1, 12, 14, 16), 1, 4),  # taps > 8: fori-loop oy path
    ])
    def test_dfgrad_kernel_matches_xla_vjp(self, shape, c, halo):
        """The Pallas df-cotangent must match the XLA composition's VJP
        wherever the halo bound holds (a.e. — the subgradient choice at
        exact-integer source coords differs, measure zero for random df)."""
        from pulpo_tpu.kernels.warp_halo import (
            _warp_halo_dfgrad_pallas,
            halo_bound_ok,
        )
        from pulpo_tpu.ops.warp import warp_image

        mov = self._field(shape + (c,), 1.0, seed=12)
        df = self._field(shape + (3,), halo - 1.2, seed=13)
        g = self._field(shape + (c,), 1.0, seed=14)
        assert bool(halo_bound_ok(df, halo))
        _, vjp = jax.vjp(warp_image, mov, df)
        ref = vjp(g)[1]
        got = _warp_halo_dfgrad_pallas(mov, df, g, halo, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_dfgrad_kernel_sample_tiled(self):
        """df/g batch = S x moving batch mirrors the forward tiling."""
        from pulpo_tpu.kernels.warp_halo import _warp_halo_dfgrad_pallas
        from pulpo_tpu.ops.warp import warp_image

        mov = self._field((2, 8, 10, 12, 1), 1.0, seed=15)
        df = self._field((6, 8, 10, 12, 3), 0.8, seed=16)
        g = self._field((6, 8, 10, 12, 1), 1.0, seed=17)
        _, vjp = jax.vjp(warp_image, mov, df)
        ref = vjp(g)[1]
        got = _warp_halo_dfgrad_pallas(mov, df, g, 2, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def _outlier_df(self, shape, n_out, mag=6.0, seed=20):
        """Smooth small df + n_out isolated large-displacement voxels
        (the trained-model regime the repair tier exists for)."""
        rng = np.random.default_rng(seed)
        df = rng.uniform(-0.8, 0.8, size=shape + (3,)).astype(np.float32)
        flat = df.reshape(-1, 3)
        pick = rng.choice(flat.shape[0], size=n_out, replace=False)
        flat[pick] = rng.uniform(mag - 1.0, mag, (n_out, 3)) * np.where(
            rng.random((n_out, 3)) < 0.5, -1.0, 1.0)
        return jnp.asarray(df)

    def test_repair_indices_matches_nonzero(self):
        """cumsum+searchsorted compaction == jnp.nonzero(size=k) up to
        the fill convention (ours fills with n, nonzero fills with the
        given fill_value)."""
        from pulpo_tpu.kernels.warp_halo import _repair_indices

        rng = np.random.default_rng(7)
        for n_set, k in ((0, 4), (5, 8), (8, 8), (20, 8)):
            bad = np.zeros(200, dtype=bool)
            bad[rng.choice(200, size=n_set, replace=False)] = True
            got = np.asarray(_repair_indices(jnp.asarray(bad), k))
            want = np.flatnonzero(bad)[:k]
            np.testing.assert_array_equal(got[: len(want)], want)
            assert (got[len(want):] == 200).all()

    @pytest.mark.parametrize("n_out", [1, 20, 400])
    def test_cascade_repair_tier_matches_xla(self, n_out):
        """A single out-of-bound voxel takes the small-budget repair
        branch (k=1), more take the large-budget branch (20 <= 2% = 33),
        too many (400) fall back to the full XLA gather. All must equal
        warp_image exactly."""
        from pulpo_tpu.kernels.warp_halo import (
            halo_bad_mask,
            repair_budgets,
            warp_cascaded,
        )
        from pulpo_tpu.ops.warp import warp_image

        shape = (1, 10, 12, 14)
        mov = self._field(shape + (1,), 1.0, seed=21)
        df = self._outlier_df(shape, n_out)
        ks = repair_budgets(df)
        n_bad = int(jnp.sum(halo_bad_mask(df, 3)))
        assert (n_bad <= ks[-1]) == (n_out != 400), (n_bad, ks)
        assert (n_bad <= ks[0]) == (n_out == 1), (n_bad, ks)
        ref = warp_image(mov, df)
        got = warp_cascaded(mov, df, halos=(2, 3), interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("n_out", [1, 20, 400])
    def test_dfgrad_repair_tier_matches_xla(self, n_out):
        from pulpo_tpu.kernels.warp_halo import _dfgrad_cascaded
        from pulpo_tpu.ops.warp import warp_image

        shape = (1, 10, 12, 14)
        mov = self._field(shape + (1,), 1.0, seed=22)
        df = self._outlier_df(shape, n_out, seed=23)
        g = self._field(shape + (1,), 1.0, seed=24)
        _, vjp = jax.vjp(warp_image, mov, df)
        ref = vjp(g)[1]
        got = _dfgrad_cascaded(mov, df, g, (2, 3), interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_cascade_grad_matches_xla(self):
        from pulpo_tpu.kernels.warp_halo import warp_cascaded_grad
        from pulpo_tpu.ops.warp import warp_image

        mov = self._field((1, 6, 8, 10, 1), 1.0, seed=10)
        df = self._field((1, 6, 8, 10, 3), 0.5, seed=11)
        g_ref = jax.grad(lambda m, d: jnp.sum(warp_image(m, d) ** 2), (0, 1))(
            mov, df)
        g_got = jax.grad(
            lambda m, d: jnp.sum(warp_cascaded_grad(m, d, True) ** 2), (0, 1))(
            mov, df)
        for a, b in zip(g_got, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


class TestMgradCascade:
    """Moving-cotangent halo kernel + the tiered squaring backward
    (round 3: the XLA gather+scatter vjp of late squaring steps was
    1.92 s of a 4.65 s full-res train step)."""

    @pytest.mark.parametrize("halo,mag,c", [
        (2, 1.2, 3),
        (3, 2.1, 3),
        (2, 1.0, 1),
    ])
    def test_mgrad_pallas_matches_xla_vjp(self, halo, mag, c):
        from pulpo_tpu.kernels.warp_halo import _warp_halo_mgrad_pallas
        from pulpo_tpu.ops.warp import warp_image

        shape = (2, 12, 14, 16)
        rng = np.random.default_rng(21)
        d = rng.uniform(-1, 1, size=(*shape, 3)).astype(np.float32)
        d *= mag / np.abs(d).max()
        df = jnp.asarray(d)
        moving = jnp.asarray(
            rng.standard_normal((*shape, c)).astype(np.float32))
        g = jnp.asarray(rng.standard_normal((*shape, c)).astype(np.float32))
        _, vjp = jax.vjp(warp_image, moving, df)
        ref = vjp(g)[0]
        got = _warp_halo_mgrad_pallas(df, g, halo, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_mgrad_border_clamp(self):
        """Displacements that clamp at volume borders still agree (the
        weights use the clipped source coordinates, like the forward)."""
        from pulpo_tpu.kernels.warp_halo import _warp_halo_mgrad_pallas
        from pulpo_tpu.ops.warp import warp_image

        shape = (1, 10, 12, 14)
        rng = np.random.default_rng(22)
        df = jnp.full((*shape, 3), 1.9, jnp.float32)  # pushes past edges
        moving = jnp.asarray(
            rng.standard_normal((*shape, 1)).astype(np.float32))
        g = jnp.asarray(rng.standard_normal((*shape, 1)).astype(np.float32))
        _, vjp = jax.vjp(warp_image, moving, df)
        ref = vjp(g)[0]
        got = _warp_halo_mgrad_pallas(df, g, 2, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_mgrad_cascaded_repair_branch(self):
        """A few out-of-tier voxels take the sparse-repair branch: their
        scatter contributions come from the exact per-row vjp."""
        from pulpo_tpu.kernels.warp_halo import _mgrad_cascaded
        from pulpo_tpu.ops.warp import warp_image

        shape = (1, 12, 14, 16)
        rng = np.random.default_rng(23)
        d = rng.uniform(-1.5, 1.5, size=(*shape, 3)).astype(np.float32)
        d[0, 3, 4, 5] = (9.0, -7.0, 8.0)  # far out of the H=3 bound
        d[0, 8, 2, 9] = (-6.0, 6.0, -6.0)
        df = jnp.asarray(d)
        moving = jnp.asarray(
            rng.standard_normal((*shape, 3)).astype(np.float32))
        g = jnp.asarray(rng.standard_normal((*shape, 3)).astype(np.float32))
        _, vjp = jax.vjp(warp_image, moving, df)
        ref = vjp(g)[0]
        got = _mgrad_cascaded(moving, df, g, (2, 3), interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    @pytest.mark.parametrize("mag", [1.4, 2.2])
    def test_tiered_squaring_bwd_matches_xla(self, mag):
        """The composed tiered backward (identity + dfgrad cascade +
        mgrad cascade) == jax.vjp of the XLA squaring step for fields
        past the sub-voxel bound."""
        from pulpo_tpu.kernels.warp_halo import (_dfgrad_cascaded,
                                                 _mgrad_cascaded)
        from pulpo_tpu.kernels.warp_local import _squaring_step_xla

        shape = (1, 20, 24, 28, 3)
        rng = np.random.default_rng(24)
        v = rng.uniform(-1, 1, size=shape).astype(np.float32)
        v *= mag / np.abs(v).max()
        vec = jnp.asarray(v)
        g = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        _, vjp = jax.vjp(_squaring_step_xla, vec)
        ref = vjp(g)[0]
        got = (g + _dfgrad_cascaded(vec, vec, g, (2, 3), interpret=True)
               + _mgrad_cascaded(vec, vec, g, (2, 3), interpret=True))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=2e-5)

    def test_mgrad_y_blocked_matches_xla_vjp(self):
        """S1 large enough that the kernel runs multiple y blocks
        (ny > 1) — block-edge halo arithmetic must stay exact."""
        from pulpo_tpu.kernels.warp_halo import _warp_halo_mgrad_pallas
        from pulpo_tpu.ops.warp import warp_image

        shape = (1, 4, 48, 112)  # by=24, ny=2 under the 4096-elem cap
        rng = np.random.default_rng(25)
        d = rng.uniform(-1, 1, size=(*shape, 3)).astype(np.float32)
        d *= 1.3 / np.abs(d).max()
        df = jnp.asarray(d)
        moving = jnp.asarray(
            rng.standard_normal((*shape, 1)).astype(np.float32))
        g = jnp.asarray(rng.standard_normal((*shape, 1)).astype(np.float32))
        _, vjp = jax.vjp(warp_image, moving, df)
        ref = vjp(g)[0]
        got = _warp_halo_mgrad_pallas(df, g, 2, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


class TestVelHeadFused:
    """velocity_head (fused whole-VelocityField-head MXU kernel,
    kernels/vel_head.py): forward must match the flax/XLA eval
    composition up to f32 summation order; VJP is defined AS the XLA
    composition vjp; the flax routing (PULPO_FUSED_VELHEAD=interp hook)
    must be output-equivalent to the unfused module."""

    def _params(self, key, zdim=3, n0=8, ndims=3):
        import jax
        import jax.numpy as jnp

        ks = jax.random.split(key, 14)
        r = lambda i, shape, s=1.0: jax.random.normal(ks[i], shape) * s
        return {
            "k1": r(0, (3, 3, 3, zdim, n0), 0.3),
            "b1": r(1, (n0,), 0.1),
            "mean1": r(2, (n0,), 0.5),
            "var1": jax.nn.softplus(r(3, (n0,))) + 0.1,
            "scale1": r(4, (n0,)) + 1.0,
            "bias1": r(5, (n0,), 0.2),
            "k2": r(6, (3, 3, 3, n0, n0), 0.2),
            "b2": r(7, (n0,), 0.1),
            "mean2": r(8, (n0,), 0.5),
            "var2": jax.nn.softplus(r(9, (n0,))) + 0.1,
            "scale2": r(10, (n0,)) + 1.0,
            "bias2": r(11, (n0,), 0.2),
            "k3": r(12, (1, 1, 1, n0, ndims), 0.5),
            "b3": r(13, (ndims,), 0.1),
        }

    def test_forward_matches_xla_f32(self):
        import jax
        import numpy as np

        from pulpo_tpu.kernels.vel_head import (
            velocity_head_fused,
            velocity_head_xla,
        )

        key = jax.random.key(21)
        p = self._params(key)
        # S0 edge planes (zero-plane logic) and S2 < WP lane masking are
        # exercised by the full-tensor comparison
        z = jax.random.normal(jax.random.fold_in(key, 1), (2, 16, 10, 12, 3))
        out = velocity_head_fused(z, p, interpret=True)
        ref = velocity_head_xla(z, p)
        assert out.shape == ref.shape == (2, 16, 10, 12, 3)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0, atol=3e-5)

    def test_forward_matches_xla_bf16(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from pulpo_tpu.kernels.vel_head import (
            velocity_head_fused,
            velocity_head_xla,
        )

        key = jax.random.key(22)
        p = self._params(key, n0=16)
        z = jax.random.normal(
            jax.random.fold_in(key, 1), (1, 8, 20, 24, 3), jnp.bfloat16)
        out = velocity_head_fused(z, p, interpret=True)
        assert out.dtype == jnp.bfloat16
        ref = velocity_head_xla(z, p)
        err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32))
        assert err.max() < 0.05 * np.abs(np.asarray(ref, np.float32)).max()

    def test_vjp_is_xla_composition(self):
        import jax
        import numpy as np

        from pulpo_tpu.kernels.vel_head import velocity_head, velocity_head_xla

        key = jax.random.key(23)
        p = self._params(key)
        z = jax.random.normal(jax.random.fold_in(key, 1), (1, 8, 10, 12, 3))
        g = jax.random.normal(jax.random.fold_in(key, 2), z.shape)
        out_f, vjp_f = jax.vjp(lambda a, q: velocity_head(a, q, True), z, p)
        out_r, vjp_r = jax.vjp(velocity_head_xla, z, p)
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                                   rtol=0, atol=3e-5)
        gz_f, gp_f = vjp_f(g)
        gz_r, gp_r = vjp_r(g)
        np.testing.assert_array_equal(np.asarray(gz_f), np.asarray(gz_r))
        for k in gp_r:
            np.testing.assert_array_equal(np.asarray(gp_f[k]),
                                          np.asarray(gp_r[k]))

    def test_flax_routing_matches_unfused(self, monkeypatch):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from pulpo_tpu.models.blocks import VelocityField

        vf = VelocityField(ndims=3, max_channels=8, depth=3)
        # guard needs vol >= 32768, S0 % 8 == 0, S2 + 2 <= 128
        z = jax.random.normal(jax.random.key(24), (1, 16, 48, 56, 3))
        variables = vf.init({"params": jax.random.key(25)}, z, True)
        # nontrivial running stats (init leaves mean=0/var=1)
        bs = jax.tree.map(lambda a: a, variables["batch_stats"])
        for u in ("ConvUnit_0", "ConvUnit_1"):
            n = bs[u]["BatchNorm_0"]["mean"].shape[0]
            bs[u]["BatchNorm_0"]["mean"] = (
                jax.random.normal(jax.random.fold_in(jax.random.key(26), n),
                                  (n,)) * 0.3)
            bs[u]["BatchNorm_0"]["var"] = (
                jax.nn.softplus(jax.random.normal(
                    jax.random.fold_in(jax.random.key(27), n), (n,))) + 0.2)
        variables = {"params": variables["params"], "batch_stats": bs}

        monkeypatch.setenv("PULPO_FUSED_VELHEAD", "0")
        ref = vf.apply(variables, z, False)
        monkeypatch.setenv("PULPO_FUSED_VELHEAD", "interp")
        got = vf.apply(variables, z, False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=3e-5)
        # train=True must stay on the unfused path (batch-stat BN)
        got_t = vf.apply(variables, z, True,
                         mutable=["batch_stats"])[0]
        ref_t = vf.apply(variables, z, True,
                         mutable=["batch_stats"])[0]
        np.testing.assert_array_equal(np.asarray(got_t), np.asarray(ref_t))

    def test_xla_mirror_matches_flax_module(self):
        import jax
        import numpy as np

        from pulpo_tpu.kernels.vel_head import velocity_head_xla
        from pulpo_tpu.models.blocks import VelocityField

        vf = VelocityField(ndims=3, max_channels=8, depth=3)
        z = jax.random.normal(jax.random.key(28), (1, 8, 10, 12, 3))
        variables = vf.init({"params": jax.random.key(29)}, z, True)
        pp, bs = variables["params"], variables["batch_stats"]

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
        ref = vf.apply(variables, z, False)
        got = velocity_head_xla(z, p)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


class TestPosHeadFused:
    """posterior_head (fused whole-posterior-head MXU kernel,
    kernels/pos_head.py): forward must match the flax/XLA eval
    composition (up_block + split merge + mu/sigma heads) up to f32
    summation order; the per-pair y2 half must broadcast across folded
    samples exactly like models/blocks._RawConv; VJP is defined AS the
    XLA composition vjp; the Autoencoder routing
    (PULPO_FUSED_POSTHEAD=interp hook) must be output-equivalent to the
    unfused module."""

    def _params(self, key, c_fb=5, n_up=8, n_merge=8, zd=3):
        import jax
        import jax.numpy as jnp

        ks = jax.random.split(key, 40)
        it = iter(range(40))
        r = lambda shape, s=1.0: jax.random.normal(ks[next(it)], shape) * s

        def unit(pre, n, kshape, cout):
            return {
                f"{pre}k{n}": r(kshape, 0.2),
                f"{pre}b{n}": r((cout,), 0.1),
                f"{pre}mean{n}": r((cout,), 0.3),
                f"{pre}var{n}": jax.nn.softplus(r((cout,))) + 0.1,
                f"{pre}scale{n}": r((cout,)) + 1.0,
                f"{pre}bias{n}": r((cout,), 0.2),
            }

        p = {}
        p.update(unit("u", 1, (3, 3, 3, c_fb, n_up), n_up))
        p.update(unit("u", 2, (3, 3, 3, n_up, n_up), n_up))
        p.update(unit("m", 1, (3, 3, 3, n_up, n_merge), n_merge))
        p.update(unit("m", 2, (3, 3, 3, n_merge, n_merge), n_merge))
        p["hkmu"] = r((1, 1, 1, n_merge, zd), 0.5)
        p["hbmu"] = r((zd,), 0.1)
        p["hksig"] = r((1, 1, 1, n_merge, zd), 0.5)
        p["hbsig"] = r((zd,), 0.1)
        return p

    def test_forward_matches_xla_f32(self):
        import jax
        import numpy as np

        from pulpo_tpu.kernels.pos_head import (
            posterior_head_fused,
            posterior_head_xla,
        )

        key = jax.random.key(31)
        p = self._params(key)
        # S0 edge planes (warmup zero-plane logic), S2 < WP lane
        # masking, and ring carry-over across z-octets (S0 = 16 -> two
        # grid steps) are all exercised by the full-tensor comparison
        fb = jax.random.normal(jax.random.fold_in(key, 1), (2, 16, 10, 12, 5))
        y2 = jax.random.normal(jax.random.fold_in(key, 2), (2, 16, 10, 12, 8))
        mu_f, sg_f = posterior_head_fused(fb, y2, p, interpret=True)
        mu_r, sg_r = posterior_head_xla(fb, y2, p)
        scale = float(np.abs(np.asarray(mu_r)).max())
        np.testing.assert_allclose(np.asarray(mu_f), np.asarray(mu_r),
                                   rtol=0, atol=3e-6 * scale)
        np.testing.assert_allclose(np.asarray(sg_f), np.asarray(sg_r),
                                   rtol=0, atol=3e-6 * scale)

    def test_pair_broadcast_matches_split_semantics(self):
        import jax
        import numpy as np

        from pulpo_tpu.kernels.pos_head import (
            posterior_head_fused,
            posterior_head_xla,
        )

        key = jax.random.key(32)
        p = self._params(key)
        # R = 4 sample-major rows over B = 2 pairs: row r reads y2[r % B]
        fb = jax.random.normal(jax.random.fold_in(key, 1), (4, 16, 10, 12, 5))
        y2 = jax.random.normal(jax.random.fold_in(key, 2), (2, 16, 10, 12, 8))
        mu_f, sg_f = posterior_head_fused(fb, y2, p, interpret=True)
        mu_r, sg_r = posterior_head_xla(fb, y2, p)
        scale = float(np.abs(np.asarray(mu_r)).max())
        np.testing.assert_allclose(np.asarray(mu_f), np.asarray(mu_r),
                                   rtol=0, atol=3e-6 * scale)
        np.testing.assert_allclose(np.asarray(sg_f), np.asarray(sg_r),
                                   rtol=0, atol=3e-6 * scale)

    def test_forward_matches_xla_bf16(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from pulpo_tpu.kernels.pos_head import (
            posterior_head_fused,
            posterior_head_xla,
        )

        key = jax.random.key(33)
        p = self._params(key, n_up=16, n_merge=16)
        fb = jax.random.normal(
            jax.random.fold_in(key, 1), (2, 8, 20, 24, 5), jnp.bfloat16)
        y2 = jax.random.normal(
            jax.random.fold_in(key, 2), (1, 8, 20, 24, 16), jnp.bfloat16)
        mu_f, sg_f = posterior_head_fused(fb, y2, p, interpret=True)
        assert mu_f.dtype == jnp.bfloat16 and sg_f.dtype == jnp.bfloat16
        mu_r, sg_r = posterior_head_xla(fb, y2, p)
        for a, b in ((mu_f, mu_r), (sg_f, sg_r)):
            err = np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))
            assert err.max() < 0.05 * np.abs(np.asarray(b, np.float32)).max()

    def test_vjp_is_xla_composition(self):
        import jax
        import numpy as np

        from pulpo_tpu.kernels.pos_head import posterior_head, posterior_head_xla

        key = jax.random.key(34)
        p = self._params(key)
        fb = jax.random.normal(jax.random.fold_in(key, 1), (2, 8, 10, 12, 5))
        y2 = jax.random.normal(jax.random.fold_in(key, 2), (1, 8, 10, 12, 8))
        out_f, vjp_f = jax.vjp(lambda a, b, q: posterior_head(a, b, q, True),
                               fb, y2, p)
        out_r, vjp_r = jax.vjp(posterior_head_xla, fb, y2, p)
        g = jax.tree.map(
            lambda a: jax.random.normal(jax.random.fold_in(key, 3), a.shape),
            out_r)
        scale = float(np.abs(np.asarray(out_r[0])).max())
        np.testing.assert_allclose(np.asarray(out_f[0]), np.asarray(out_r[0]),
                                   rtol=0, atol=3e-6 * scale)
        gf = vjp_f(g)
        gr = vjp_r(g)
        for a, b in zip(jax.tree.leaves(gf), jax.tree.leaves(gr)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_autoencoder_routing_matches_unfused(self, monkeypatch):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from pulpo_tpu.config import PULPoConfig
        from pulpo_tpu.models.api import PULPoModel
        from pulpo_tpu.models.pulpo import PULPoModule

        # l0 latent size (32, 32, 64): vol 65536 >= 32768, S0 % 8 == 0,
        # S2 + 2 <= 128 -> the guard admits exactly level 0
        cfg = PULPoConfig(input_size=(64, 64, 128), total_levels=3,
                          latent_levels=2, n0=8, dataset="synthetic")
        model = PULPoModel(cfg)
        variables = model.init(jax.random.key(40))
        # nontrivial running stats (init leaves mean=0/var=1)
        k = [0]

        def perturb(path, a):
            name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            if name not in ("mean", "var"):
                return a
            k[0] += 1
            v = jax.random.normal(jax.random.fold_in(jax.random.key(41), k[0]),
                                  a.shape) * 0.3
            return jax.nn.softplus(v) + 0.2 if name == "var" else v

        variables = dict(variables)
        variables["batch_stats"] = jax.tree_util.tree_map_with_path(
            perturb, variables["batch_stats"])

        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.random((1, *cfg.input_size, 1), dtype=np.float32))
        y = jnp.asarray(rng.random((1, *cfg.input_size, 1), dtype=np.float32))
        acts = model.module.apply(variables, x, y, train=False,
                                  method=PULPoModule.encode)
        keys = jax.random.split(jax.random.key(42), 2)

        def decode():
            return model.module.apply(
                variables, x, acts, False, False,
                method=PULPoModule.decode, n_samples=2, sample_keys=keys)

        monkeypatch.setenv("PULPO_FUSED_POSTHEAD", "0")
        ref = decode()
        monkeypatch.setenv("PULPO_FUSED_POSTHEAD", "interp")
        got = decode()
        # mus/sigmas at the fused level: tight; downstream leaves
        # (integration + warps amplify) : loose but relative
        mu_scale = float(np.abs(np.asarray(ref[0][0])).max())
        np.testing.assert_allclose(np.asarray(got[0][0]), np.asarray(ref[0][0]),
                                   rtol=0, atol=1e-5 * mu_scale)
        np.testing.assert_allclose(np.asarray(got[1][0]), np.asarray(ref[1][0]),
                                   rtol=0, atol=1e-5 * mu_scale)
        for gd, rd in zip(got[2:], ref[2:]):
            for l in rd:
                a, b = np.asarray(gd[l]), np.asarray(rd[l])
                sc = max(np.abs(b).max(), 1e-6)
                np.testing.assert_allclose(a, b, rtol=0, atol=1e-4 * sc)
        # coarsest level (guard rejects it) must be bit-identical
        np.testing.assert_array_equal(np.asarray(got[0][1]),
                                      np.asarray(ref[0][1]))


class TestConvChainFused:
    """conv_chain (fused plain ConvSequence kernel, attic/
    conv_chain.py): forward must match the flax/XLA eval composition at
    every supported depth and at both WP legs (128 / 256); VJP is the
    XLA composition vjp; ConvSequence routing
    (PULPO_FUSED_CONVSEQ=interp) must be output-equivalent."""

    def _stages(self, key, widths):
        import jax

        out = []
        for i in range(len(widths) - 1):
            ks = jax.random.split(jax.random.fold_in(key, i), 6)
            cin, cout = widths[i], widths[i + 1]
            out.append({
                "k": jax.random.normal(ks[0], (3, 3, 3, cin, cout)) * 0.25,
                "b": jax.random.normal(ks[1], (cout,)) * 0.1,
                "mean": jax.random.normal(ks[2], (cout,)) * 0.3,
                "var": jax.nn.softplus(jax.random.normal(ks[3], (cout,))) + 0.1,
                "scale": jax.random.normal(ks[4], (cout,)) + 1.0,
                "bias": jax.random.normal(ks[5], (cout,)) * 0.2,
            })
        return out

    @pytest.mark.parametrize("widths,shape,wp", [
        ((2, 8, 8, 8), (16, 10, 12), 128),   # D=3, down_block_0 shape
        ((3, 8, 8), (16, 10, 12), 128),      # D=2
        ((2, 8, 8, 8), (8, 6, 130), 256),    # full-res WP leg
    ])
    def test_forward_matches_xla_f32(self, widths, shape, wp):
        import jax
        import numpy as np

        from pulpo_tpu.attic.conv_chain import (
            conv_chain_fused,
            conv_chain_xla,
        )

        key = jax.random.key(51)
        st = self._stages(key, widths)
        x = jax.random.normal(jax.random.fold_in(key, 9),
                              (2, *shape, widths[0]))
        got = conv_chain_fused(x, st, wp=wp, interpret=True)
        ref = conv_chain_xla(x, st)
        scale = float(np.abs(np.asarray(ref)).max())
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=3e-6 * scale)

    def test_forward_matches_xla_bf16(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from pulpo_tpu.attic.conv_chain import (
            conv_chain_fused,
            conv_chain_xla,
        )

        key = jax.random.key(52)
        st = self._stages(key, (2, 16, 16, 16))
        x = jax.random.normal(jax.random.fold_in(key, 9), (2, 8, 10, 12, 2),
                              jnp.bfloat16)
        got = conv_chain_fused(x, st, interpret=True)
        assert got.dtype == jnp.bfloat16
        ref = conv_chain_xla(x, st)
        err = np.abs(np.asarray(got, np.float32) - np.asarray(ref, np.float32))
        assert err.max() < 0.05 * np.abs(np.asarray(ref, np.float32)).max()

    def test_vjp_is_xla_composition(self):
        import jax
        import numpy as np

        from pulpo_tpu.attic.conv_chain import conv_chain, conv_chain_xla

        key = jax.random.key(53)
        st = self._stages(key, (2, 8, 8))
        x = jax.random.normal(jax.random.fold_in(key, 9), (1, 8, 10, 12, 2))
        out_f, vjp_f = jax.vjp(lambda a, s: conv_chain(a, s, 128, True), x, st)
        out_r, vjp_r = jax.vjp(conv_chain_xla, x, st)
        g = jax.random.normal(jax.random.fold_in(key, 10), out_r.shape)
        scale = float(np.abs(np.asarray(out_r)).max())
        np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_r),
                                   rtol=0, atol=3e-6 * scale)
        for a, b in zip(jax.tree.leaves(vjp_f(g)), jax.tree.leaves(vjp_r(g))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_convsequence_routing_matches_unfused(self, monkeypatch):
        import jax
        import numpy as np

        from pulpo_tpu.models.blocks import ConvSequence

        cs = ConvSequence(features=8, depth=3)
        # guard: vol >= 32768, S0 % 8 == 0, S2 + 2 <= 128, cin <= 8
        x = jax.random.normal(jax.random.key(54), (1, 16, 48, 56, 2))
        variables = cs.init({"params": jax.random.key(55)}, x, True)
        bs = variables["batch_stats"]
        k = [0]

        def perturb(path, a):
            name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
            k[0] += 1
            v = jax.random.normal(
                jax.random.fold_in(jax.random.key(56), k[0]), a.shape) * 0.3
            return jax.nn.softplus(v) + 0.2 if name == "var" else v

        bs = jax.tree_util.tree_map_with_path(perturb, bs)
        variables = {"params": variables["params"], "batch_stats": bs}

        monkeypatch.setenv("PULPO_FUSED_CONVSEQ", "0")
        ref = cs.apply(variables, x, False)
        monkeypatch.setenv("PULPO_FUSED_CONVSEQ", "interp")
        got = cs.apply(variables, x, False)
        scale = float(np.abs(np.asarray(ref)).max())
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=1e-5 * scale)
        # train=True must stay on the unfused path (batch-stat BN)
        got_t = cs.apply(variables, x, True, mutable=["batch_stats"])[0]
        ref_t = cs.apply(variables, x, True, mutable=["batch_stats"])[0]
        np.testing.assert_array_equal(np.asarray(got_t), np.asarray(ref_t))


class TestWarpCoarse:
    """Coarse-offset large-displacement tier (kernels/warp_halo.py,
    round 4): per-slab integer z offsets + per-row y/x offsets lift the
    +-H bound; every branch (dense, repaired, gather fallback) must
    match ops/warp.warp_image exactly."""

    def _smooth_large_field(self, key, b_df, S, amp=10.0):
        import jax
        import jax.numpy as jnp

        g = [jnp.linspace(0, 2 * jnp.pi, s) for s in S]
        zz, yy, xx = jnp.meshgrid(*g, indexing="ij")
        df = jnp.stack([
            amp * jnp.sin(0.5 * zz + 0.3) * jnp.cos(0.4 * yy),
            0.8 * amp * jnp.cos(0.6 * xx) * jnp.sin(0.5 * zz),
            -0.9 * amp * jnp.sin(0.4 * yy + 1.0),
        ], axis=-1)[None]
        df = jnp.tile(df, (b_df, 1, 1, 1, 1))
        return df + 0.3 * jax.random.normal(key, (b_df, *S, 3))

    @pytest.mark.parametrize("amp", [6.0, 12.0, 20.0])
    def test_coarse_tier_matches_gather(self, amp):
        import jax
        import jax.numpy as jnp

        from pulpo_tpu.kernels.warp_halo import warp_coarse_tier
        from pulpo_tpu.ops.warp import warp_image

        key = jax.random.key(3)
        S = (16, 24, 28)
        mov = jax.random.normal(jax.random.fold_in(key, 1), (1, *S, 1))
        df = self._smooth_large_field(jax.random.fold_in(key, 2), 2, S, amp)
        ref = warp_image(mov, df)
        got = jax.jit(
            lambda m, d: warp_coarse_tier(m, d, 3, interpret=True))(mov, df)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=1e-5)

    def test_pure_z_shift_hits_dense_branch(self):
        """A constant integer z shift far beyond H must be absorbed
        entirely by the per-slab cz (bad mask empty -> dense branch),
        and still match the gather."""
        import jax
        import jax.numpy as jnp

        from pulpo_tpu.kernels.warp_halo import (coarse_bad_mask,
                                                 coarse_offsets,
                                                 warp_coarse_tier)
        from pulpo_tpu.ops.warp import warp_image

        key = jax.random.key(4)
        S = (16, 24, 28)
        mov = jax.random.normal(key, (1, *S, 1))
        # rel ~ df * S/(S-1) plus the grid term; keep df well inside the
        # volume so clipping does not bend rel: shift 6 voxels in z
        df = jnp.zeros((1, *S, 3)).at[..., 0].set(6.0)
        cz, cyx = coarse_offsets(df, 1, 4)
        assert int(jnp.max(jnp.abs(cz))) >= 5
        bad = coarse_bad_mask(df, 3, cz, cyx, 1, 4)
        assert float(bad.mean()) == 0.0
        got = jax.jit(
            lambda m, d: warp_coarse_tier(m, d, 3, interpret=True))(mov, df)
        ref = warp_image(mov, df)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=1e-5)

    def test_cascade_routes_large_fields_exactly(self, monkeypatch):
        import jax
        import jax.numpy as jnp

        from pulpo_tpu.kernels.warp_halo import warp_cascaded
        from pulpo_tpu.ops.warp import warp_image

        # opt-in since the round-4 composed A/B (-12.9% program tax on
        # OASIS); this test exercises the wired-in cascade branch
        monkeypatch.setenv("PULPO_WARP_COARSE", "1")
        key = jax.random.key(5)
        S = (16, 24, 28)
        mov = jax.random.normal(key, (1, *S, 1))
        df = self._smooth_large_field(jax.random.fold_in(key, 7), 2, S, 10.0)
        ref = warp_image(mov, df)
        got = jax.jit(
            lambda m, d: warp_cascaded(m, d, interpret=True))(mov, df)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=1e-5)

    def test_sample_tiled_rows_share_moving(self):
        """b_df = 3 * b: rows sharing a moving row share (cy, cx) by
        construction; results must still match the per-row gather."""
        import jax
        import jax.numpy as jnp

        from pulpo_tpu.kernels.warp_halo import warp_coarse_tier
        from pulpo_tpu.ops.warp import warp_image

        key = jax.random.key(6)
        S = (8, 16, 20)
        mov = jax.random.normal(jax.random.fold_in(key, 1), (2, *S, 1))
        df = self._smooth_large_field(jax.random.fold_in(key, 2), 6, S, 8.0)
        ref = warp_image(mov, df)
        got = jax.jit(
            lambda m, d: warp_coarse_tier(m, d, 3, interpret=True))(mov, df)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=1e-5)
