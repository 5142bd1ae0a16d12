"""TPU A/B probe: Pallas halo warp vs XLA gather warp at the hot shape.

The UQ decode's dominant warp is `transformed = warp(x_fullres,
final_df_fullres)` with df batch = chunk*B (sample-tiled). Times both
implementations fetch-forced (the relay ignores block_until_ready).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_warp_halo.py
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pulpo_tpu.kernels.warp_halo import warp_halo_guarded
from pulpo_tpu.ops.warp import warp_image

S = (160, 192, 224)
B, BDF = 2, 8

rng = np.random.default_rng(0)
mov = jnp.asarray(rng.standard_normal((B, *S, 1)).astype(np.float32))
# bounded displacements: the halo guard inspects clip(src)-g which
# includes the align_corners=False half-voxel shift, so keep |v| < 1.2
# (normal tails at 165M samples exceed any small halo)
df = jnp.asarray(rng.uniform(-1.2, 1.2, (BDF, *S, 3)).astype(np.float32))


def timed(name, fn, *args, iters=3):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    float(jax.device_get(jnp.sum(f(*args)[..., 0])))
    print(f"{name}: compile+1 {time.perf_counter() - t0:.2f}s",
          file=sys.stderr, flush=True)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jax.device_get(jnp.sum(f(*args)[..., 0])))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: warm {min(ts):.3f}s  (all: "
          + " ".join(f"{t:.3f}" for t in ts) + ")", flush=True)
    return min(ts)


from pulpo_tpu.kernels.warp_halo import halo_bound_ok
for h in (2, 3):
    print(f"guard halo{h}: {bool(halo_bound_ok(df, h))}", flush=True)
t_xla = timed("xla_take", warp_image, mov, df)
for halo in (2, 3):
    t_p = timed(f"halo{halo}", lambda m, d, h=halo: warp_halo_guarded(m, d, h),
                mov, df)
    print(f"halo{halo} speedup vs xla: {t_xla / t_p:.2f}x", flush=True)

# exactness on-hardware (not just interpret mode)
ref = np.asarray(warp_image(mov, df))
got = np.asarray(warp_halo_guarded(mov, df, 2))
err = np.abs(ref - got).max()
print(f"max|halo2 - xla| on hardware: {err:.2e}", flush=True)
print("PROBE_WARP_HALO_DONE", flush=True)
