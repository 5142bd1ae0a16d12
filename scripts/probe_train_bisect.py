"""Bisect the full-res train step (4.62 s/step at B=1, round 3):
time variants with one cost center removed to locate where the step
goes: SVF integration fwd+bwd (nsteps=0), windowed NCC fwd+bwd
(recon=mse), both.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
  python scripts/probe_train_bisect.py
"""
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pulpo_tpu.config import PULPoConfig
from pulpo_tpu.models.api import PULPoModel
from pulpo_tpu.train.step import create_train_state, make_train_step

ITERS = 3


def bench(tag, cfg):
    model = PULPoModel(cfg, dtype=jnp.bfloat16)
    state, tx = create_train_state(model, seed=0)
    x = jax.random.uniform(jax.random.key(1), (1, *cfg.input_size, 1))
    y = jax.random.uniform(jax.random.key(2), (1, *cfg.input_size, 1))
    batch = {"x": x, "y": y}
    step = jax.jit(make_train_step(model, tx), donate_argnums=0)
    t0 = time.perf_counter()
    state, metrics = step(state, batch)
    float(jax.device_get(metrics["total_loss"]))
    comp = time.perf_counter() - t0
    ts = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        state, metrics = step(state, batch)
        float(jax.device_get(metrics["total_loss"]))
        ts.append(time.perf_counter() - t0)
    print(f"{tag:28s} compile+1 {comp:7.1f}s  warm {min(ts):6.2f}s  "
          f"({' '.join(f'{t:.2f}' for t in ts)})", flush=True)


def main():
    base = PULPoConfig(input_size=(160, 192, 224), total_levels=5,
                       latent_levels=4, n0=32, dataset="synthetic",
                       compute_dtype="bfloat16")
    bench("train_base", base)
    bench("train_nsteps0", dataclasses.replace(base, nsteps=0))
    bench("train_mse", dataclasses.replace(base, recon_loss=("mse",)))
    bench("train_mse_nsteps0",
          dataclasses.replace(base, recon_loss=("mse",), nsteps=0))
    print("PROBE_TRAIN_BISECT_DONE", flush=True)


if __name__ == "__main__":
    main()
