"""Probe 3D conv throughput strategies on the v5e (the decode's conv
stack measured ~43 TFLOP/s = 25% of the 171 measured matmul peak).

Candidates, all computing the same 3x3x3 SAME conv at the level-0
decode shape (8 rows x 80x96x112 x 96ch bf16):

  xla        lax.conv_general_dilated channels-last (current impl)
  xla_pad128 channels zero-padded to 128 in/out (exact after slice)
  tapsum     27 shifted batched matmuls accumulated (einsum per tap)
  xla_f32acc conv with preferred_element_type=f32

Timing follows the relay rules: chain iterations through a data
dependency, end with a host fetch of a dependent scalar.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_conv.py
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = 8
SP = (80, 96, 112)
C = 96
K = 3
ITERS = 8
FLOPS = 2 * B * SP[0] * SP[1] * SP[2] * (K**3) * C * C


def dn(nd):
    lhs = (0, nd - 1) + tuple(range(1, nd - 1))
    rhs = (nd - 1, nd - 2) + tuple(range(0, nd - 2))
    return jax.lax.ConvDimensionNumbers(lhs, rhs, lhs)


def conv_xla(x, k, **kw):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=dn(5), **kw)


def conv_pad128(x, k):
    xp = jnp.pad(x, ((0, 0),) * 4 + ((0, 128 - C),))
    kp = jnp.pad(k, ((0, 0),) * 3 + ((0, 128 - C), (0, 128 - C)))
    return conv_xla(xp, kp)[..., :C]


def conv_tapsum(x, k):
    # SAME pad once, then 27 shifted slices each contracted [C,C] on MXU
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    out = None
    for dz in range(K):
        for dy in range(K):
            for dx in range(K):
                sl = jax.lax.dynamic_slice(
                    xp, (0, dz, dy, dx, 0), (B, *SP, C))
                t = jnp.einsum("bzyxc,cf->bzyxf", sl, k[dz, dy, dx],
                               preferred_element_type=jnp.bfloat16)
                out = t if out is None else out + t
    return out


def bench(tag, fn, x, k):
    f = jax.jit(lambda x, k: fn(x, k).astype(jnp.bfloat16))
    t0 = time.perf_counter()
    r = f(x, k)
    float(jax.device_get(r.mean().astype(jnp.float32)))
    comp = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(ITERS):
        x = f(x, k) * jnp.bfloat16(0.98) + x * jnp.bfloat16(0.02)
    float(jax.device_get(x.mean().astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / ITERS
    print(f"{tag:12s} compile+1 {comp:6.1f}s  warm {dt * 1e3:8.2f} ms  "
          f"{FLOPS / dt / 1e12:6.1f} TFLOP/s", flush=True)


def main():
    kx = jax.random.key(0)
    x = jax.random.normal(kx, (B, *SP, C), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (K, K, K, C, C),
                          jnp.bfloat16) * 0.05
    print(f"# shape {x.shape} kernel {k.shape} "
          f"{FLOPS / 1e12:.3f} TFLOP/conv", flush=True)
    bench("xla", conv_xla, x, k)
    bench("xla_f32acc", lambda a, b: conv_xla(
        a, b, preferred_element_type=jnp.float32), x, k)
    bench("xla_pad128", conv_pad128, x, k)
    bench("tapsum", conv_tapsum, x, k)


if __name__ == "__main__":
    main()
