"""Conv pad-variant probe for the decode's merge shapes (96->64,
64->64) plus one-sided padding: probe_conv2 showed pad128 wins 4.4x at
96->96 and loses everywhere the pad ratio exceeds ~2 — these shapes
straddle the boundary, and one-sided pads may capture the win at half
the waste.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_conv3.py
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ITERS = 8
K = 3
B, SP = 8, (80, 96, 112)


def dn(nd):
    lhs = (0, nd - 1) + tuple(range(1, nd - 1))
    rhs = (nd - 1, nd - 2) + tuple(range(0, nd - 2))
    return jax.lax.ConvDimensionNumbers(lhs, rhs, lhs)


def conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=dn(5))


def bench(tag, cin, cout, pad_in: bool, pad_out: bool):
    flops = 2 * B * SP[0] * SP[1] * SP[2] * (K**3) * cin * cout
    x0 = jax.random.normal(jax.random.key(0), (B, *SP, cin), jnp.bfloat16)
    k0 = jax.random.normal(jax.random.key(1), (K, K, K, cin, cout),
                           jnp.bfloat16) * 0.05
    proj = jax.random.normal(jax.random.key(2), (cout, cin),
                             jnp.bfloat16) * 0.05
    cip = 128 if pad_in else cin
    cop = 128 if pad_out else cout

    def one(x, k):
        xp = jnp.pad(x, ((0, 0),) * 4 + ((0, cip - cin),)) if pad_in else x
        kp = jnp.pad(k, ((0, 0),) * 3 + ((0, cip - cin), (0, cop - cout)))
        y = conv(xp, kp)
        return y[..., :cout] if pad_out else y

    @jax.jit
    def chain(x, k):
        for _ in range(ITERS):
            y = one(x, k)
            x = jnp.einsum("bzyxc,cf->bzyxf", y, proj,
                           preferred_element_type=jnp.bfloat16)
        return x.mean().astype(jnp.float32)

    t0 = time.perf_counter()
    float(jax.device_get(chain(x0, k0)))
    comp = time.perf_counter() - t0
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        float(jax.device_get(chain(x0, k0)))
        ts.append(time.perf_counter() - t0)
    dt = min(ts) / ITERS
    mode = f"in{cip}out{cop}"
    print(f"{tag:14s} {mode:12s} compile {comp:6.1f}s  {dt * 1e3:8.2f} ms"
          f"  {flops / dt / 1e12:6.1f} TFLOP/s", flush=True)


def main():
    for cin, cout in ((96, 64), (64, 64), (64, 96), (16, 96)):
        tag = f"{cin}->{cout}"
        bench(tag, cin, cout, False, False)
        bench(tag, cin, cout, True, True)
        if cin != 128:
            bench(tag, cin, cout, True, False)
        if cout != 128:
            bench(tag, cin, cout, False, True)
    print("PROBE_CONV3_DONE", flush=True)


if __name__ == "__main__":
    main()
