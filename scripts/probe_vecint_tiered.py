"""Hardware validation + timing of the tiered squaring step / VecInt
(kernels/warp_local.py SQUARING_HALOS) at the flagship level-0 shape
(8 rows x 80x96x112): correctness vs the XLA composition and per-call
times at init-scale and trained-scale field magnitudes.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
  python scripts/probe_vecint_tiered.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pulpo_tpu.kernels.warp_local import integrate_svf_pallas
from pulpo_tpu.ops.warp import integrate_svf

SHAPE = (8, 80, 96, 112, 3)


def timed(name, fn, *args, iters=3):
    out = fn(*args, jnp.float32(0.0))
    t0 = time.perf_counter()
    float(jax.device_get(out.mean()))
    comp = time.perf_counter() - t0
    acc = jnp.float32(0.0)
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = fn(*args, acc).mean().astype(jnp.float32)
    float(jax.device_get(acc))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: compile+1 {comp:.2f}s warm {dt:.3f}s", flush=True)


def main():
    rng = np.random.default_rng(5)
    base = rng.uniform(-1, 1, size=SHAPE).astype(np.float32)

    for mag, tag in ((1.5, "init-scale"), (6.0, "trained-scale"),
                     (12.0, "large-deformation")):
        v = jnp.asarray(base * (mag / np.abs(base).max()))

        tiered = jax.jit(lambda x, acc: integrate_svf_pallas(x + acc, 7))
        xla = jax.jit(lambda x, acc: integrate_svf(x + acc, 7))

        got = tiered(v, jnp.float32(0.0))
        ref = xla(v, jnp.float32(0.0))
        diff = float(jax.device_get(jnp.max(jnp.abs(got - ref))))
        rel = diff / float(jax.device_get(jnp.max(jnp.abs(ref))))
        print(f"[{tag} mag={mag}] maxdiff {diff:.3e} (rel {rel:.2e})",
              flush=True)

        timed(f"vecint_tiered {tag}", tiered, v)
        timed(f"vecint_xla {tag}", xla, v)

    print("PROBE_VECINT_TIERED_DONE", flush=True)


if __name__ == "__main__":
    main()
