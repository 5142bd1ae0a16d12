"""Conv throughput per model shape: XLA channels-last vs channel-pad-128.

probe_conv round-1 result (per-dispatch timing, decode l0 shape
8x80x96x112, 96->96): xla 9.2 TFLOP/s, pad128 55.9 — but each timed
call paid the relay dispatch+fetch overhead. This probe chains ITERS
convs INSIDE one jit (dispatch paid once) and sweeps the shapes the
model actually runs, to decide where _RawConv should channel-pad.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_conv2.py
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


def dn(nd):
    lhs = (0, nd - 1) + tuple(range(1, nd - 1))
    rhs = (nd - 1, nd - 2) + tuple(range(0, nd - 2))
    return jax.lax.ConvDimensionNumbers(lhs, rhs, lhs)


def conv(x, k):
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=dn(5))


def rup(c, m=128):
    return -(-c // m) * m


def bench(tag, b, sp, cin, cout, pad: bool):
    flops = 2 * b * sp[0] * sp[1] * sp[2] * (K**3) * cin * cout
    kx = jax.random.key(0)
    x0 = jax.random.normal(kx, (b, *sp, cin), jnp.bfloat16)
    k0 = jax.random.normal(jax.random.key(1), (K, K, K, cin, cout),
                           jnp.bfloat16) * 0.05
    # chain through a cin-sized projection so iterations are dependent
    proj = jax.random.normal(jax.random.key(2), (cout, cin),
                             jnp.bfloat16) * 0.05

    def one(x, k):
        if pad:
            cip, cop = rup(cin), rup(cout)
            xp = jnp.pad(x, ((0, 0),) * 4 + ((0, cip - cin),))
            kp = jnp.pad(k, ((0, 0),) * 3 + ((0, cip - cin),
                                             (0, cop - cout)))
            return conv(xp, kp)[..., :cout]
        return conv(x, k)

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
    print(f"{tag:26s} {'pad128' if pad else 'xla   '} compile {comp:6.1f}s"
          f"  {dt * 1e3:8.2f} ms/conv  {flops / dt / 1e12:6.1f} TFLOP/s",
          flush=True)


def main():
    cases = [
        # decode l0 latent-res (chunk4 x B2 = 8 rows)
        ("l0 up/merge 96->96", 8, (80, 96, 112), 96, 96),
        ("l0 up_block 16->96", 8, (80, 96, 112), 16, 96),
        ("l0 merge fb 96->96", 8, (80, 96, 112), 96, 96),
        ("l0 velfield 3->32", 8, (80, 96, 112), 3, 32),
        ("l0 velfield 32->32", 8, (80, 96, 112), 32, 32),
        # encoder full-res down block (B=2)
        ("down0 fullres 2->32", 2, (160, 192, 224), 2, 32),
        ("down0 fullres 32->32", 2, (160, 192, 224), 32, 32),
        # encoder half-res (B=2, 64 ch)
        ("down1 halfres 32->64", 2, (80, 96, 112), 32, 64),
    ]
    seen = set()
    for tag, b, sp, ci, co in cases:
        key = (b, sp, ci, co)
        if key in seen:
            continue
        seen.add(key)
        bench(tag, b, sp, ci, co, pad=False)
        bench(tag, b, sp, ci, co, pad=True)
    print("PROBE_CONV2_DONE", flush=True)


if __name__ == "__main__":
    main()
