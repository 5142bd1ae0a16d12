"""Hardware-Mosaic-safe nonlinearities for the fused-head kernels.

Hardware Mosaic (the real-TPU Pallas lowering; interpret mode does not
enforce this) rejects `arith.cmpf` on bf16 vectors ("Target does not
support this comparison", observed on v5e for the LeakyReLU mask) —
while bf16 *select*, add, mul are fine (the default-on halo warp
kernels use them). The safe pattern is: route every floating
comparison through the exact f32 upcast (bf16 -> f32 is value-exact,
so the mask is bit-identical to the bf16 compare), keep the selected
values in the compute dtype.

`jax.nn.softplus` at bf16 hits the same wall internally (logaddexp's
`lax.max` / isnan select compare at bf16). `softplus_dt` replicates
its exact finite-value numerics with staged f32 transcendentals: XLA
computes bf16 exp/log1p by per-op upcast-compute-round, so rounding
each transcendental back to dt reproduces `jax.nn.softplus(x)` bit for
bit on finite x (pinned by tests/test_activations.py, plus
indirectly at head shapes by the fused-head parity tests in
tests/test_kernels.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def leaky(x: jnp.ndarray, dt) -> jnp.ndarray:
    """LeakyReLU(0.2) == flax nn.leaky_relu; mask computed in f32."""
    neg = x.astype(jnp.float32) < 0.0
    return jnp.where(neg, jnp.asarray(0.2, dt) * x, x)


def leaky_from_f32(y: jnp.ndarray, dt) -> jnp.ndarray:
    """leaky(y.astype(dt), dt) with the mask taken from the PRE-rounded
    f32 value: bf16 round-to-nearest preserves sign (a tiny negative
    rounds to -0.0, and 0.2 * -0.0 == -0.0 == the passthrough branch),
    so `y < 0` and `round(y) < 0` select identical VALUES everywhere.
    Saves the f32 upcast temp chain inside the fused-head epilogues —
    the vel_head kernel was 144K over Mosaic's 16M scoped-VMEM stack
    limit with the upcasting mask."""
    x = y.astype(dt)
    return jnp.where(y < 0.0, jnp.asarray(0.2, dt) * x, x)


def softplus_dt(x: jnp.ndarray, dt) -> jnp.ndarray:
    """jax.nn.softplus(x) for finite x, without bf16 comparisons.

    softplus(x) = logaddexp(x, 0) = max(x, 0) + log1p(exp(-|x|))
    (jax/_src/numpy/ufuncs.py logaddexp; the isnan branch only differs
    on non-finite inputs, which the heads never produce).
    """
    xf = x.astype(jnp.float32)
    m = jnp.where(xf >= 0.0, x, jnp.zeros((), dt))  # max(x, 0) in dt
    e = jnp.exp(-jnp.abs(xf)).astype(dt)            # dt exp, f32-staged
    l = jnp.log1p(e.astype(jnp.float32)).astype(dt)
    return m + l
