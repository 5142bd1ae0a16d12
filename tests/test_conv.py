"""conv3d_tapgrad: the hand-written tap-sum backward must match XLA's
conv vjp (which itself golden-matches torch via tests/test_model.py's
parity harness). The custom backward exists purely for TPU memory
layout (ops/conv.py docstring) — numerics must be identical up to f32
accumulation order."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pulpo_tpu.ops.conv import _conv_xla, conv3d_tapgrad, use_tapgrad


@pytest.mark.parametrize("shape,cin,cout", [
    ((2, 6, 7, 8), 5, 4),
    ((1, 9, 4, 5), 2, 3),
])
def test_tapgrad_matches_xla_vjp(shape, cin, cout):
    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    x = jax.random.normal(k1, (*shape, cin), jnp.float32)
    k = jax.random.normal(k2, (3, 3, 3, cin, cout), jnp.float32) * 0.2
    g = jax.random.normal(k3, (*shape, cout), jnp.float32)

    out_ref, vjp_ref = jax.vjp(_conv_xla, x, k)
    out_tap, vjp_tap = jax.vjp(conv3d_tapgrad, x, k)
    np.testing.assert_allclose(out_tap, out_ref, rtol=0, atol=1e-5)

    dx_ref, dk_ref = vjp_ref(g)
    dx_tap, dk_tap = vjp_tap(g)
    np.testing.assert_allclose(dx_tap, dx_ref, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(dk_tap, dk_ref, rtol=1e-5, atol=1e-4)


def test_tapgrad_grad_of_loss():
    """End-to-end: grad through a scalar loss, both paths identical."""
    k1, k2 = jax.random.split(jax.random.key(1))
    x = jax.random.normal(k1, (1, 5, 6, 7, 3), jnp.float32)
    k = jax.random.normal(k2, (3, 3, 3, 3, 2), jnp.float32) * 0.3

    loss_ref = lambda xx, kk: (_conv_xla(xx, kk) ** 2).sum()
    loss_tap = lambda xx, kk: (conv3d_tapgrad(xx, kk) ** 2).sum()
    gx_ref, gk_ref = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    gx_tap, gk_tap = jax.grad(loss_tap, argnums=(0, 1))(x, k)
    np.testing.assert_allclose(gx_tap, gx_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gk_tap, gk_ref, rtol=1e-4, atol=1e-4)


def test_use_tapgrad_policy():
    big = jnp.zeros((1, 160, 192, 224, 2))
    small = jnp.zeros((1, 20, 24, 28, 2))
    assert use_tapgrad(big, 3, "SAME")
    assert not use_tapgrad(small, 3, "SAME")
    assert not use_tapgrad(big, 1, "SAME")       # 1x1 convs stay XLA
    assert not use_tapgrad(big, 3, "VALID")      # unpadded depth-1 path
    assert not use_tapgrad(big[:, 0], 3, "SAME")  # 2D stays XLA


def test_rawconv_pad128_branch_matches_unpadded():
    """The 96->96 channel-padding fast path (blocks._RawConv) is exact:
    compare against the plain XLA conv with the same params."""
    from pulpo_tpu.models.blocks import _RawConv

    x = jax.random.normal(jax.random.key(2), (1, 4, 5, 6, 96), jnp.float32)
    m = _RawConv(features=96, kernel_size=3)
    v = m.init(jax.random.key(3), x)
    out = m.apply(v, x)
    k = v["params"]["kernel"]
    b = v["params"]["bias"]
    ref = _conv_xla(x, k) + b
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_im2col_matches_xla_conv_and_vjp():
    """conv3d_im2col: forward (27-view concat + one matmul) must match
    the XLA conv up to f32 accumulation order; its VJP is defined AS the
    XLA conv vjp and must match it exactly."""
    from pulpo_tpu.attic.im2col import conv3d_im2col

    k1, k2, k3 = jax.random.split(jax.random.key(7), 3)
    x = jax.random.normal(k1, (2, 6, 7, 8, 3), jnp.float32)
    k = jax.random.normal(k2, (3, 3, 3, 3, 5), jnp.float32) * 0.2
    g = jax.random.normal(k3, (2, 6, 7, 8, 5), jnp.float32)

    out_ref, vjp_ref = jax.vjp(_conv_xla, x, k)
    out_im, vjp_im = jax.vjp(conv3d_im2col, x, k)
    np.testing.assert_allclose(out_im, out_ref, rtol=0, atol=1e-5)
    for a, b in zip(vjp_im(g), vjp_ref(g)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_im2col_bf16_accumulates_f32():
    """bf16 operands must accumulate in f32 (preferred_element_type),
    matching the conv path's precision class: summing 27*cin bf16
    products of ~1-magnitude values in bf16 would lose ~2 decimal
    digits; against an f32 reference the error must stay at bf16
    rounding scale."""
    from pulpo_tpu.attic.im2col import conv3d_im2col

    k1, k2 = jax.random.split(jax.random.key(8))
    x = jax.random.normal(k1, (1, 5, 6, 7, 4), jnp.float32)
    k = jax.random.normal(k2, (3, 3, 3, 4, 4), jnp.float32) * 0.2
    ref = _conv_xla(x, k)
    out = conv3d_im2col(x.astype(jnp.bfloat16), k.astype(jnp.bfloat16))
    err = np.abs(np.asarray(out, np.float32) - np.asarray(ref))
    assert err.max() < 0.15 * np.abs(np.asarray(ref)).max()
