"""Probe: Pallas halo-stencil warp vs the XLA gather on the real TPU.

Round-3 measurements (v5e, full-res 160x192x224, 8 df rows / 2 moving):
  xla_take 4.85s | halo2 0.065s (74.7x) | halo3 0.099s (48.9x)
  dfgrad_halo2 0.079s vs XLA vjp 3.84s (48.7x)
  halo4/halo5: Mosaic compile failure (scoped-VMEM stack) -> hardware
  cascade capped at (2, 3).
This revision validates the production cascade (2, 3) fwd+bwd, jitted
correctness checks included.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from pulpo_tpu.ops.warp import warp_image
from pulpo_tpu.kernels.warp_halo import (
    _dfgrad_cascaded,
    halo_cascade,
    warp_cascaded,
)

S = (160, 192, 224)
B, BDF = 2, 8
print(f"cascade tiers: {halo_cascade()}", flush=True)

rng = np.random.default_rng(0)
mov = jnp.asarray(rng.standard_normal((B, *S, 1)).astype(np.float32))
df_s = jnp.asarray(rng.uniform(-1.2, 1.2, (BDF, *S, 3)).astype(np.float32))
df_m = jnp.asarray(rng.uniform(-2.2, 2.2, (BDF, *S, 3)).astype(np.float32))
df_b = jnp.asarray(rng.uniform(-8.0, 8.0, (BDF, *S, 3)).astype(np.float32))
g = jnp.asarray(rng.standard_normal((BDF, *S, 1)).astype(np.float32))


def timed(name, fn, *args, iters=3):
    f = jax.jit(fn)
    try:
        t0 = time.perf_counter()
        float(jax.device_get(f(*args).sum()))
        print(f"{name}: compile+1 {time.perf_counter() - t0:.2f}s", flush=True)
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(jax.device_get(f(*args).sum()))
            ts.append(time.perf_counter() - t0)
        print(f"{name}: warm {min(ts):.3f}s  (all: "
              + " ".join(f"{t:.3f}" for t in ts) + ")", flush=True)
        return min(ts)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)
        return None


@jax.jit
def maxdiff_fwd(m, d):
    return jnp.max(jnp.abs(warp_cascaded(m, d) - warp_image(m, d)))


def xla_dfgrad(m, d, gg):
    _, vjp = jax.vjp(warp_image, m, d)
    return vjp(gg)[1]


@jax.jit
def maxdiff_bwd(m, d, gg):
    return jnp.max(jnp.abs(
        _dfgrad_cascaded(m, d, gg, halo_cascade()) - xla_dfgrad(m, d, gg)))


# the ONE production cascade program on every df class
for tag, d in (("small(t1)", df_s), ("mid(t2)", df_m), ("big(xla)", df_b)):
    t = timed(f"cascade {tag}", warp_cascaded, mov, d)
    if t is not None:
        print(f"  fwd maxdiff {tag}: "
              f"{float(jax.device_get(maxdiff_fwd(mov, d))):.2e}", flush=True)

# backward cascade at each tier
for tag, d in (("small(t1)", df_s), ("mid(t2)", df_m)):
    t = timed(f"dfgrad_cascade {tag}",
              lambda m, dd, gg: _dfgrad_cascaded(m, dd, gg, halo_cascade()),
              mov, d, g)
    if t is not None:
        print(f"  bwd maxdiff {tag}: "
              f"{float(jax.device_get(maxdiff_bwd(mov, d, g))):.2e}",
              flush=True)

print("PROBE_WARP_HALO_DONE", flush=True)
