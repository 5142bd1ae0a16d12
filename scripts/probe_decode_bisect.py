"""Bisect the composed UQ decode chunk: parts sum to ~0.5s but the whole
runs 3.1s (probe_decode_breakdown, v5e). Times decode variants with one
feature disabled at a time to locate the composition overhead.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
  python scripts/probe_decode_bisect.py
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pulpo_tpu.config import PULPoConfig
from pulpo_tpu.models.api import PULPoModel
from pulpo_tpu.models.pulpo import PULPoModule

B, S = 2, 4


def bench_decode(tag, cfg, deterministic=False, iters=3):
    model = PULPoModel(cfg, dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0))
    x = jax.random.uniform(jax.random.key(6), (B, *cfg.input_size, 1),
                           jnp.float32)
    y = jax.random.uniform(jax.random.key(7), (B, *cfg.input_size, 1),
                           jnp.float32)
    acts = model.module.apply(variables, x, y, train=False,
                              method=PULPoModule.encode)
    keys = jax.random.split(jax.random.key(8), S)

    @jax.jit
    def run(v, xx, a, ks, acc):
        outs = model.module.apply(v, xx + acc.astype(xx.dtype), a,
                                  deterministic, False,
                                  method=PULPoModule.decode,
                                  n_samples=S,
                                  sample_keys=None if deterministic else ks)
        return outs[7][0].astype(jnp.float32)

    t0 = time.perf_counter()
    float(jax.device_get(run(variables, x, acts, keys,
                             jnp.float32(0.0)).mean()))
    comp = time.perf_counter() - t0
    acc = jnp.float32(0.0)
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = run(variables, x, acts, keys, acc).mean().astype(jnp.float32)
    float(jax.device_get(acc))
    dt = (time.perf_counter() - t0) / iters
    print(f"{tag}: compile+1 {comp:.2f}s warm {dt:.3f}s", flush=True)
    return dt


def main():
    base = PULPoConfig(input_size=(160, 192, 224), total_levels=5,
                       latent_levels=4, n0=32, dataset="synthetic",
                       compute_dtype="bfloat16")

    bench_decode("decode_base (stochastic, cascade)", base)

    # 1) XLA warps everywhere (no pallas warp kernels at all)
    os.environ["PULPO_NO_PALLAS_WARP"] = "1"
    bench_decode("decode_no_pallas_warp", base)
    del os.environ["PULPO_NO_PALLAS_WARP"]

    # 2) deterministic decode (mu, no RNG draws)
    bench_decode("decode_deterministic", base, deterministic=True)

    # 3) no SVF integration (isolates VecInt + its guard machinery)
    bench_decode("decode_nsteps0", dataclasses.replace(base, nsteps=0))

    # 4) minimal feedback (3ch samples only; shrinks the resize+up_block
    # input, keeps the path alive — empty feedback is unsupported)
    bench_decode("decode_fb_samples_only",
                 dataclasses.replace(base, feedback=("samples",)))

    # 5) sample-count scaling: S=1 vs S=4 (fixed above)
    global S
    S = 1
    bench_decode("decode_S1", base)
    S = 4

    print("PROBE_DECODE_BISECT_DONE", flush=True)


if __name__ == "__main__":
    main()
