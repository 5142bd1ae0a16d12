"""Probe: Pallas halo-stencil warp vs the XLA gather on the real TPU.

Round-3 measurements (v5e, full-res 160x192x224, 8 df rows / 2 moving):
  xla_take 4.85s | halo2 0.065s (74.7x) | halo3 0.099s (48.9x)
  halo8: stack-OOM (41.5M unrolled chain), then Mosaic rejects the
  fori-oy restructure (dynamic sublane slice) -> hardware tiers capped
  at UNROLL_TAPS_MAX. This revision probes the H=4/H=5 mid tiers, the
  cascade dispatch, and the dfgrad backward kernel.
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
    _warp_halo_dfgrad_pallas,
    halo_bound_ok,
    warp_cascaded,
    warp_halo_guarded,
)

S = (160, 192, 224)
B, BDF = 2, 8

rng = np.random.default_rng(0)
mov = jnp.asarray(rng.standard_normal((B, *S, 1)).astype(np.float32))
# tier-1 df: |v| < 1.2 (guard incl. the align_corners=False shift);
# mid-tier df: exceeds H=2, fits H=4
df_s = jnp.asarray(rng.uniform(-1.2, 1.2, (BDF, *S, 3)).astype(np.float32))
df_m = jnp.asarray(rng.uniform(-3.2, 3.2, (BDF, *S, 3)).astype(np.float32))
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


t_xla = timed("xla_take mid-df", warp_image, mov, df_m)

for halo in (4, 5):
    t_p = timed(f"halo{halo} mid-df",
                lambda m, d, h=halo: warp_halo_guarded(m, d, h), mov, df_m)
    if t_p:
        print(f"halo{halo} speedup vs xla: {t_xla / t_p:.2f}x", flush=True)
        ref = warp_image(mov, df_m)
        out = warp_halo_guarded(mov, df_m, halo)
        err = float(jnp.max(jnp.abs(ref - out)))
        print(f"max|halo{halo} - xla| on hardware: {err:.2e}", flush=True)

# cascade dispatch: tier-1 hit on small df, tier-2 hit on mid df
t_c1 = timed("cascade small-df", warp_cascaded, mov, df_s)
t_c2 = timed("cascade mid-df", warp_cascaded, mov, df_m)

# dfgrad backward kernel at tier 1 (the training hot path) vs XLA vjp
def xla_dfgrad(m, d, gg):
    _, vjp = jax.vjp(warp_image, m, d)
    return vjp(gg)[1]


t_bx = timed("dfgrad_xla small-df", xla_dfgrad, mov, df_s, g)
t_bp = timed("dfgrad_halo2 small-df",
             lambda m, d, gg: _warp_halo_dfgrad_pallas(m, d, gg, 2),
             mov, df_s, g)
if t_bp and t_bx:
    print(f"dfgrad speedup vs xla: {t_bx / t_bp:.2f}x", flush=True)
    ref = xla_dfgrad(mov, df_s, g)
    out = _warp_halo_dfgrad_pallas(mov, df_s, g, 2)
    err = float(jnp.max(jnp.abs(ref - out)))
    print(f"max|dfgrad - xla| on hardware: {err:.2e}", flush=True)

print("PROBE_WARP_HALO_DONE", flush=True)
