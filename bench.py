"""Benchmark: registered pairs/sec with 32 posterior samples, OASIS
full-res (160x192x224), on one TPU chip.

North-star metric from BASELINE.md: >= 20 pairs/sec/chip with 32
posterior samples (the full UQ workload: per-sample decode + per-sample
SVF integration + std maps + mean-SVF re-warp, all on-chip).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "pairs/s", "vs_baseline": N/20}

Env knobs:
  PULPO_BENCH_BATCH  pairs per program invocation (default from
                     PULPO_BENCH_DEFAULTS tuning; throughput = B*iters/dt)
  PULPO_BENCH_CHUNK  posterior-sample chunk (default: tuned / auto)
  PULPO_BENCH_MODE   "uq" (default) | "train" (full-res train-step
                     throughput, BASELINE config 2; prints steps/s)
  PULPO_BENCH_ITERS, PULPO_BENCH_DTYPE, PULPO_BENCH_SMALL
"""

from __future__ import annotations

import json
import os
import sys
import time

# persistent compile cache: the relay's AOT TPU compiles run 45+ min
# for the full-res UQ program; cache hits make reruns of an unchanged
# program near-instant. NOTE: env vars are NOT enough here — the axon
# sitecustomize imports jax at interpreter startup, before this module
# runs, so JAX_COMPILATION_CACHE_DIR set from Python is never read
# (this was the round-2 "cache did not capture the UQ executable" bug:
# only shells that exported the var ever wrote entries). jax.config
# updates work regardless of import order.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def _enable_compile_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

BASELINE_PAIRS_PER_SEC = 20.0
N_SAMPLES = 32

# proxy mode: same workload at a reduced resolution for B x chunk
# sweeps (full-res compiles are prohibitively slow on the relay)
_PROXY_SIZES = {"half": (80, 96, 112), "quarter": (40, 48, 56)}


def _volume_pair(batch, input_size):
    """Registration pairs with realistic statistics: OASIS volumes when
    OASIS.h5 is available, else band-limited synthetic brains warped by
    smooth deformations (not uniform noise — intensity statistics shape
    the NCC/warp numerics)."""
    import jax.numpy as jnp
    import numpy as np

    try:
        from pulpo_tpu.data.oasis import OASIS

        ds = OASIS("training", segs=False, lms=False, mask=False)
        if ds.input_size != tuple(input_size):
            raise ValueError("OASIS.h5 shape != bench input size")
        gen = np.random.default_rng(0)
        xs, ys = [], []
        for i in range(batch):
            item = ds.get_pair(i, gen)
            xs.append(item["x"])
            ys.append(item["y"])
        return jnp.stack(xs), jnp.stack(ys)
    except Exception:
        from pulpo_tpu.data.loader import DataLoader
        from pulpo_tpu.data.synthetic import SyntheticDataset

        ds = SyntheticDataset(shape=tuple(input_size), n=max(2, batch), seed=0)
        b = next(iter(DataLoader(ds, batch_size=batch, shuffle=False)))
        return jnp.asarray(b["x"]), jnp.asarray(b["y"])


def _make_model(input_size, batch_size: int = 1):
    import jax.numpy as jnp

    from pulpo_tpu.config import PULPoConfig
    from pulpo_tpu.models.api import PULPoModel

    cfg = PULPoConfig(
        input_size=input_size,
        total_levels=5,
        latent_levels=4,
        n0=32,
        batch_size=batch_size,
        compute_dtype=os.environ.get("PULPO_BENCH_DTYPE", "bfloat16"),
        dataset="oasis",
    )
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    return cfg, PULPoModel(cfg, dtype=dtype)


def bench_uq(input_size, batch: int, chunk: int | None, iters: int):
    import jax
    import jax.numpy as jnp

    from pulpo_tpu.uq.predict import predict_with_uncertainty

    cfg, model = _make_model(input_size)
    t0 = time.perf_counter()
    variables = model.init(jax.random.key(0))
    jax.block_until_ready(variables)
    print(f"# init {time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)

    x, y = _volume_pair(batch, cfg.input_size)
    rng = jax.random.key(2)

    def run(r):
        res = predict_with_uncertainty(model, variables, x, y, N_SAMPLES, r, chunk=chunk)
        return res.mean_outputs[0], res.output_std[0], res.final_df_std[0]

    # Iterations are chained through the rng key: the next key mixes in a
    # scalar from the previous result, so a remote/async runtime cannot
    # overlap, reorder or cache the timed calls. The heavy program itself
    # stays key-parameterized only (fast to re-compile / cache-friendly);
    # the mixer is a trivial second jit.
    @jax.jit
    def mix_key(base, i, prev_scalar):
        salt = jnp.abs(prev_scalar * 1e6).astype(jnp.int32)
        return jax.random.fold_in(jax.random.fold_in(base, i), salt)

    # IMPORTANT: jax.block_until_ready does NOT block under the axon
    # relay (measured round 3: a 64-deep chained-matmul program
    # "completed" in 0.000s). Only a host transfer of a value that is
    # data-dependent on the result proves execution finished — every
    # timed region must END in one. Round-2's self-reported numbers
    # lacked this and were inflated.
    t0 = time.perf_counter()
    out = run(rng)  # warmup / compile
    float(jax.device_get(out[1].mean()))
    print(f"# warmup+compile {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    prev = out[1].mean()
    for i in range(iters):
        out = run(mix_key(rng, i, prev))
        prev = out[1].mean()
    float(jax.device_get(prev))  # force completion of the full chain
    dt = time.perf_counter() - t0
    return iters * batch / dt


def bench_train(input_size, batch: int, iters: int):
    """Train-step throughput (BASELINE milestone config 2: OASIS
    full-res single-chip training, NCC + hierarchical KL)."""
    import jax
    import jax.numpy as jnp
    import optax

    from pulpo_tpu.train.step import create_train_state, make_train_step

    cfg, model = _make_model(input_size, batch_size=batch)
    state, tx = create_train_state(model, seed=0)
    step = jax.jit(make_train_step(model, tx), donate_argnums=0)

    x, y = _volume_pair(batch, cfg.input_size)
    batch_data = {"x": x, "y": y}
    state, metrics = step(state, batch_data)  # compile
    float(jax.device_get(metrics["total_loss"]))

    # steps chain through the donated state: no overlap/caching
    # possible; the final host fetch forces real completion (the relay
    # ignores block_until_ready, see bench_uq)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch_data)
    float(jax.device_get(metrics["total_loss"]))
    dt = time.perf_counter() - t0
    return iters * batch / dt


def main():
    _enable_compile_cache()
    input_size = (160, 192, 224)
    small = bool(os.environ.get("PULPO_BENCH_SMALL"))
    if small:  # quick CI / CPU sanity mode
        input_size = (32, 32, 32)
    proxy = os.environ.get("PULPO_BENCH_PROXY", "")
    if proxy:
        input_size = _PROXY_SIZES[proxy]

    mode = os.environ.get("PULPO_BENCH_MODE", "uq")
    # B=2 measured 10.66 pairs/s vs 5.45 at B=1 (PERF.md): the small-C
    # convs gain real MXU utilization from batched pairs
    batch = int(os.environ.get("PULPO_BENCH_BATCH", "2"))
    iters = int(os.environ.get("PULPO_BENCH_ITERS", "5"))

    res_tag = f"{proxy}res" if proxy else "fullres"
    if mode == "train":
        sps = bench_train(input_size, batch, iters)
        result = {
            "metric": f"oasis_{res_tag}_train_pairs_per_sec",
            "value": round(sps, 4),
            "unit": "pairs/s",
            "vs_baseline": None,
        }
    else:
        chunk_env = os.environ.get("PULPO_BENCH_CHUNK", "")
        chunk = int(chunk_env) if chunk_env else (None if small else max(1, 8 // batch))
        pps = bench_uq(input_size, batch, chunk, iters)
        result = {
            "metric": f"oasis_{res_tag}_uq{N_SAMPLES}_pairs_per_sec",
            "value": round(pps, 4),
            "unit": "pairs/s",
            "vs_baseline": round(pps / BASELINE_PAIRS_PER_SEC, 4)
            if not proxy else None,
        }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
