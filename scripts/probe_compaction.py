"""Measure index-compaction primitives at full-res scale (55M bools,
~30K set): nonzero(size=K) vs cumsum+searchsorted, plus the K-point
exact warp. Decides the repair tier's machinery."""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from pulpo_tpu.kernels.warp_halo import _exact_warp_rows

N = 8 * 160 * 192 * 224
rng = np.random.default_rng(0)
bad = np.zeros(N, dtype=bool)
bad[rng.choice(N, size=30000, replace=False)] = True
bad = jnp.asarray(bad)


def timed(name, fn, *args, iters=3):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    float(jax.device_get(jnp.asarray(f(*args)).ravel()[0].astype(jnp.float32)))
    print(f"{name}: compile+1 {time.perf_counter() - t0:.2f}s", flush=True)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jax.device_get(
            jnp.asarray(f(*args)).ravel()[0].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: warm {min(ts):.3f}s", flush=True)
    return min(ts)


timed("sum(bad)", lambda b: jnp.sum(b), bad)
for K in (65536, 553 * 1024):
    timed(f"nonzero_size{K}", lambda b, _k=K: jnp.nonzero(
        b, size=_k, fill_value=0)[0], bad)
timed("cumsum_i32", lambda b: jnp.cumsum(b.astype(jnp.int32)), bad)


for K in (65536, 1107 * 1024):
    def searchsorted_compact(b, _k=K):
        cs = jnp.cumsum(b.astype(jnp.int32))
        return jnp.searchsorted(cs, jnp.arange(1, _k + 1, dtype=jnp.int32))

    timed(f"cumsum+searchsorted_K{K}", searchsorted_compact, bad)

# exact-warp fix-up at K rows (the repair payload)
S = (160, 192, 224)
mov = jnp.asarray(rng.standard_normal((2, *S, 1)).astype(np.float32))
for K in (65536, 1107 * 1024):
    dfr = jnp.asarray(rng.uniform(-5, 5, (K, 3)).astype(np.float32))
    idx = jnp.asarray(rng.choice(N, size=K).astype(np.int32))
    timed(f"exact_warp_rows_K{K}",
          lambda m, i, d: _exact_warp_rows(m, i, d), mov, idx, dfr)
    timed(f"scatter_set_K{K}",
          lambda o, i, v: o.reshape(-1, 1).at[i].set(v, mode="drop"),
          jnp.zeros((8, *S, 1), jnp.float32), idx,
          jnp.ones((K, 1), jnp.float32))

print("PROBE_COMPACTION_DONE", flush=True)
