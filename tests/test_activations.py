"""Direct bf16/f32-range contracts of the hardware-Mosaic-safe
nonlinearities (kernels/activations.py) — the bit-parity claims the
fused-head kernels rely on, pinned over wide value sweeps instead of
only indirectly at head shapes (ADVICE r4 #1)."""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from pulpo_tpu.kernels.activations import leaky, leaky_from_f32, softplus_dt


def _sweep_f32(n: int = 200_001, lo: float = -90.0, hi: float = 90.0):
    """Wide f32 sweep incl. zeros, denormal-ish tinies and bf16 rounding
    boundaries on both sides of 0."""
    base = np.linspace(lo, hi, n, dtype=np.float32)
    edges = np.array([0.0, -0.0, 1e-40, -1e-40, 1e-8, -1e-8,
                      3e38, -3e38, 0.2, -0.2], dtype=np.float32)
    return jnp.asarray(np.concatenate([base, edges]))


class TestLeaky:
    def test_bf16_matches_flax_leaky_relu(self):
        x = _sweep_f32().astype(jnp.bfloat16)
        want = jax.nn.leaky_relu(x, 0.2)
        got = leaky(x, jnp.bfloat16)
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      np.asarray(want, np.float32))

    def test_f32_matches_flax_leaky_relu(self):
        x = _sweep_f32()
        np.testing.assert_array_equal(
            np.asarray(leaky(x, jnp.float32)),
            np.asarray(jax.nn.leaky_relu(x, 0.2)))

    def test_leaky_from_f32_sign_preservation(self):
        """Mask from the PRE-rounded f32 value selects identical VALUES
        to the post-round mask everywhere — incl. tiny negatives that
        round to -0.0 (0.2 * -0.0 == -0.0 == passthrough) and tiny
        positives that round to +0.0."""
        y = _sweep_f32()
        got = leaky_from_f32(y, jnp.bfloat16)
        want = leaky(y.astype(jnp.bfloat16), jnp.bfloat16)
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      np.asarray(want, np.float32))


class TestSoftplusDt:
    def test_bf16_matches_jax_softplus_bitwise(self):
        x = _sweep_f32(lo=-40.0, hi=40.0).astype(jnp.bfloat16)
        want = jax.nn.softplus(x)
        got = softplus_dt(x, jnp.bfloat16)
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      np.asarray(want, np.float32))

    def test_f32_matches_jax_softplus_bitwise(self):
        x = _sweep_f32(lo=-40.0, hi=40.0)
        want = jax.nn.softplus(x)
        got = softplus_dt(x, jnp.float32)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
