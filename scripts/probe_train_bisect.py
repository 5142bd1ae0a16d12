"""Bisect the full-res train step (3.31 s/step at B=1 at the round-3
end state): time variants with one cost center removed to locate where
the step goes: SVF integration fwd+bwd (nsteps=0), windowed NCC fwd+bwd
(recon=mse), both; plus (round-3 tail additions) the forward-only loss
eval (separates fwd from bwd+opt), tapgrad routing at every level, and
the ISOLATED backward cost of the full-res DownPath convs — sizing data
for a possible fused Pallas conv-backward kernel.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
  python scripts/probe_train_bisect.py
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
from pulpo_tpu.train.step import (
    compute_losses,
    create_train_state,
    make_train_step,
)

ITERS = 3


def bench(tag, cfg, fwd_only: bool = False):
    model = PULPoModel(cfg, dtype=jnp.bfloat16)
    state, tx = create_train_state(model, seed=0)
    x = jax.random.uniform(jax.random.key(1), (1, *cfg.input_size, 1))
    y = jax.random.uniform(jax.random.key(2), (1, *cfg.input_size, 1))
    batch = {"x": x, "y": y}
    if fwd_only:
        def loss_only(state, batch):
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            outs, _ = model.apply_train(variables, batch["x"], batch["y"],
                                        state.rng)
            total, metrics = compute_losses(
                cfg, outs, batch["x"], batch["y"], None, None)
            return metrics

        step = jax.jit(lambda s, b: (s, loss_only(s, b)))
    else:
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


def bench_conv_bwd():
    """Isolated fwd+bwd of the full-res DownPath convs through the
    tap-sum backward (ops/conv.py) — the per-conv cost a fused Pallas
    conv-backward kernel would have to beat."""
    from pulpo_tpu.ops.conv import conv3d_tapgrad

    key = jax.random.key(3)
    for cin, cout in ((2, 32), (32, 32)):
        x = jax.random.normal(key, (1, 160, 192, 224, cin), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(key, 1),
                              (3, 3, 3, cin, cout), jnp.bfloat16) * 0.1

        @jax.jit
        def fb(x, k):
            def f(x, k):
                y = conv3d_tapgrad(x, k)
                return (y.astype(jnp.float32) ** 2).sum()

            l, (dx, dk) = jax.value_and_grad(f, argnums=(0, 1))(x, k)
            return l + (dx.astype(jnp.float32) ** 2).sum() + (
                dk.astype(jnp.float32) ** 2).sum()

        t0 = time.perf_counter()
        float(jax.device_get(fb(x, k)))
        comp = time.perf_counter() - t0
        ts = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            float(jax.device_get(fb(x, k)))
            ts.append(time.perf_counter() - t0)
        print(f"conv_fwd+bwd {cin}->{cout} fullres   compile+1 {comp:7.1f}s"
              f"  warm {min(ts):6.2f}s", flush=True)


def main():
    base = PULPoConfig(input_size=(160, 192, 224), total_levels=5,
                       latent_levels=4, n0=32, dataset="synthetic",
                       compute_dtype="bfloat16")
    only = os.environ.get("PROBE_BISECT_ONLY", "")
    if only != "convbwd":
        bench("train_base", base)
        bench("train_fwdonly", base, fwd_only=True)
        bench("train_nsteps0", dataclasses.replace(base, nsteps=0))
        bench("train_mse", dataclasses.replace(base, recon_loss=("mse",)))
        bench("train_mse_nsteps0",
              dataclasses.replace(base, recon_loss=("mse",), nsteps=0))
    bench_conv_bwd()
    print("PROBE_TRAIN_BISECT_DONE", flush=True)


if __name__ == "__main__":
    main()
