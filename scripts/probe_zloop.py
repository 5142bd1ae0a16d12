"""Probe: internal-z-loop kernel structure vs per-slab grid on the TPU.

Round-3 finding (PERF.md): at full res the halo kernels run with bz=1,
so the per-slab-grid structure executes S0=160 grid steps per df row
(1280 per call at BDF=8) and roughly half the runtime is per-grid-step
FIXED overhead (H=1-vs-H=2 neutral, DMA pipelining neutral). The zloop
structure (grid over rows only, z walked by an in-kernel fori_loop with
manual output DMA — kernels/warp_halo.py) amortizes that overhead
S0/bz-fold. This probe A/Bs both structures on the forward and dfgrad
kernels at the flagship full-res shape, plus jitted exactness checks.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from pulpo_tpu.kernels import warp_halo as wh

S = (160, 192, 224)
B, BDF = 2, 8

rng = np.random.default_rng(0)
mov = jnp.asarray(rng.standard_normal((B, *S, 1)).astype(np.float32))
df = jnp.asarray(rng.uniform(-1.2, 1.2, (BDF, *S, 3)).astype(np.float32))
g = jnp.asarray(rng.standard_normal((BDF, *S, 1)).astype(np.float32))


def timed(name, fn, *args, iters=3):
    f = jax.jit(fn)
    try:
        t0 = time.perf_counter()
        float(jax.device_get(f(*args).sum()))
        print(f"{name}: compile+1 {time.perf_counter() - t0:.2f}s",
              flush=True)
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


results = {}
for halo in (2, 3):
    for zl in ("0", "1"):
        os.environ["PULPO_WARP_ZLOOP"] = zl
        tag = f"fwd h{halo} zloop={zl}"
        results[tag] = timed(
            tag, lambda m, d, h=halo: wh._warp_halo_pallas(m, d, h),
            mov, df)

for zl in ("0", "1"):
    os.environ["PULPO_WARP_ZLOOP"] = zl
    tag = f"dfgrad h2 zloop={zl}"
    results[tag] = timed(
        tag, lambda m, d, gg: wh._warp_halo_dfgrad_pallas(m, d, gg, 2),
        mov, df, g)

# jitted exactness on hardware (grid vs zloop, same inputs)
for halo in (2,):
    os.environ["PULPO_WARP_ZLOOP"] = "0"
    f_grid = jax.jit(lambda m, d: wh._warp_halo_pallas(m, d, halo))
    a = f_grid(mov, df)
    os.environ["PULPO_WARP_ZLOOP"] = "1"
    f_zl = jax.jit(lambda m, d: wh._warp_halo_pallas(m, d, halo))
    b = f_zl(mov, df)
    md = float(jax.device_get(jnp.max(jnp.abs(a - b))))
    print(f"hw exactness fwd h{halo}: maxdiff {md}", flush=True)

for k in sorted(results):
    print(f"RESULT {k}: {results[k]}", flush=True)
for pair in (("fwd h2", "fwd h3", "dfgrad h2")):
    a = results.get(f"{pair} zloop=0")
    b = results.get(f"{pair} zloop=1")
    if a and b:
        print(f"SPEEDUP {pair}: {a / b:.2f}x", flush=True)
