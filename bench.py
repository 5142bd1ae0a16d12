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
        remat=bool(os.environ.get("PULPO_BENCH_REMAT")),
        # e.g. "0" or "0,1": remat just these DownPath blocks (the
        # full-res training batch-ceiling lever, config.py remat_down)
        remat_down=tuple(
            int(k) for k in
            os.environ.get("PULPO_BENCH_REMAT_DOWN", "").split(",") if k),
        dataset="oasis",
    )
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
    return cfg, PULPoModel(cfg, dtype=dtype)


def bench_uq(input_size, batch: int, chunk: int | None, iters: int):
    import jax
    import jax.numpy as jnp

    from pulpo_tpu.uq.predict import _uq_impl, auto_chunk

    cfg, model = _make_model(input_size)
    t0 = time.perf_counter()
    variables = model.init(jax.random.key(0))
    jax.block_until_ready(variables)
    print(f"# init {time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)

    x, y = _volume_pair(batch, cfg.input_size)
    if chunk is None:
        chunk = auto_chunk(cfg, N_SAMPLES, batch=batch, dtype_bytes=2)
    print(f"# chunk {chunk}", file=sys.stderr, flush=True)

    # Relay measurement rules (PERF.md round 3):
    # - jax.block_until_ready does NOT block; every timed call ends in a
    #   host fetch of a result-dependent scalar.
    # - calls are serialized by construction: each iteration's result is
    #   fetched to the host before the next dispatch, so the relay can
    #   neither overlap nor cache them (the key also differs per call).
    # - warm per-call dispatch+fetch overhead is sub-second (measured
    #   with an 8k matmul chain), small against the multi-second UQ
    #   program. Wrapping the loop in an outer lax.scan instead brings
    #   back hour-class relay compiles (round-3 note) — don't.
    @jax.jit
    def run(v, xx, yy, base, i):
        key = jax.random.fold_in(base, i)
        res = _uq_impl(model, v, xx, yy, N_SAMPLES, key, None, chunk)
        # the fetched scalar must depend on EVERY UQResult leaf: XLA
        # dead-code-eliminates whatever the fetch doesn't reach (the
        # mean-SVF re-warp, levels>0 std maps, entropy, mse, the
        # first-chunk sample grid) — fetching only output_std[0] would
        # time a smaller program than the workload the metric claims
        # (the reference's full predict, evaluate.py:205-280).
        tot = jnp.float32(0.0)
        for leaf in jax.tree.leaves(res):
            tot = tot + leaf.astype(jnp.float32).mean()
        return tot

    base = jax.random.key(2)
    runner = run
    if os.environ.get("PULPO_BENCH_EXEC_CACHE", "1") != "0":
        try:
            runner = _aot_runner(run, (variables, x, y, base,
                                       jnp.int32(-1)), "uq")
        except Exception as e:  # noqa: BLE001 - cache is best-effort
            print(f"# exec-cache unavailable ({type(e).__name__}: "
                  f"{str(e)[:160]}); jit path", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    float(jax.device_get(runner(variables, x, y, base, jnp.int32(-1))))
    print(f"# warmup+compile {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(jax.device_get(runner(variables, x, y, base, jnp.int32(i))))
        times.append(time.perf_counter() - t0)
    print("# per-call s: " + " ".join(f"{t:.2f}" for t in times),
          file=sys.stderr, flush=True)
    return iters * batch / sum(times)


def _aot_runner(jitted, sample_args, tag: str):
    """serialize_executable-backed program cache (PERF.md round-5
    candidate 4): a driver bench run deserializes the flagship
    executable (~97 s measured for the small UQ program round 3)
    instead of paying the relay's compile weather (274 s warm - 891 s
    cold measured r4/r5). Keyed by the lowered StableHLO + jax version,
    so ANY program change recompiles and re-stores; load failures fall
    back to the jit path. Pre-warm by running `python bench.py` once
    after the last program-shaping commit."""
    import hashlib
    import pickle

    import jax
    from jax.experimental import serialize_executable as se

    cache_dir = os.environ.get("PULPO_EXEC_CACHE_DIR", "/tmp/pulpo_exec")
    os.makedirs(cache_dir, exist_ok=True)
    t0 = time.perf_counter()
    lowered = jitted.lower(*sample_args)
    key = hashlib.sha256(
        (jax.__version__ + lowered.as_text()).encode()).hexdigest()[:20]
    path = os.path.join(cache_dir, f"{tag}_{key}.pkl")
    print(f"# exec-cache key {tag}_{key} (lower {time.perf_counter()-t0:.1f}s)",
          file=sys.stderr, flush=True)
    if os.path.exists(path):
        try:
            t0 = time.perf_counter()
            with open(path, "rb") as fh:
                loaded = se.deserialize_and_load(*pickle.load(fh))
            print(f"# exec-cache hit: deserialized in "
                  f"{time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)
            return loaded
        except Exception as e:  # noqa: BLE001 - stale/incompatible blob
            print(f"# exec-cache load failed ({type(e).__name__}); "
                  f"recompiling", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    print(f"# explicit compile {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)
    try:
        t0 = time.perf_counter()
        blob = pickle.dumps(se.serialize(compiled))
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(blob)
        os.replace(tmp, path)
        print(f"# exec-cache stored {len(blob)/1e6:.0f} MB in "
              f"{time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)
    except Exception as e:  # noqa: BLE001 - serialization is optional
        print(f"# exec-cache store failed ({type(e).__name__}: "
              f"{str(e)[:160]})", file=sys.stderr, flush=True)
    return compiled


def bench_train(input_size, batch: int, iters: int):
    """Train-step throughput (BASELINE milestone config 2: OASIS
    full-res single-chip training, NCC + hierarchical KL)."""
    import jax
    import jax.numpy as jnp
    import optax

    from pulpo_tpu.train.step import create_train_state, make_train_step

    cfg, model = _make_model(input_size, batch_size=batch)
    state, tx = create_train_state(model, seed=0)

    x, y = _volume_pair(batch, cfg.input_size)
    batch_data = {"x": x, "y": y}

    # steps chain through the donated state (strictly sequential, no
    # relay overlap/caching possible); ONE final host fetch forces the
    # whole chain (block_until_ready is a no-op on the relay). An outer
    # lax.scan would amortize dispatches too but brings back hour-class
    # relay compiles (round-3 note).
    step = jax.jit(make_train_step(model, tx), donate_argnums=0)

    state, metrics = step(state, batch_data)
    t0 = time.perf_counter()
    float(jax.device_get(metrics["total_loss"]))
    print(f"# warmup+compile {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch_data)
    float(jax.device_get(metrics["total_loss"]))
    dt = time.perf_counter() - t0
    return iters * batch / dt


def _main_inner():
    input_size = (160, 192, 224)
    small = bool(os.environ.get("PULPO_BENCH_SMALL"))
    if small:  # quick CI / CPU sanity mode
        input_size = (32, 32, 32)
    proxy = os.environ.get("PULPO_BENCH_PROXY", "")
    if proxy:
        input_size = _PROXY_SIZES[proxy]

    mode = os.environ.get("PULPO_BENCH_MODE", "uq")
    # B=4 with 2-sample chunks (same 8 decode rows per scan step as
    # B=2 x chunk 4) measured 0.3694 pairs/s vs 0.3323 — the encode,
    # mean-SVF tail and per-call relay dispatch amortize over twice the
    # pairs (PERF.md round-3 table)
    # per-mode defaults: UQ amortizes fixed costs at B=4; full-res
    # TRAINING OOMs past B=1 (PERF.md batch-scaling note)
    batch = int(os.environ.get("PULPO_BENCH_BATCH",
                               "1" if mode == "train" else "4"))
    iters = int(os.environ.get("PULPO_BENCH_ITERS", "5"))

    res_tag = f"{proxy}res" if proxy else ("small" if small else "fullres")
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
        # The reference's actual hot loop is the TRAINING step
        # (src/models.py:134-196, train.py:106-116); ride the train
        # number in the SAME JSON line so the driver-captured artifact
        # records both (a second line would race the driver's parser).
        # Full-res training OOMs past B=1 (PERF.md), hence batch 1.
        if not small and not proxy and \
                os.environ.get("PULPO_BENCH_TRAIN", "1") != "0":
            try:
                sps = bench_train(input_size, 1, iters)
                result["train_metric"] = f"oasis_{res_tag}_train_pairs_per_sec"
                result["train_value"] = round(sps, 4)
                result["train_unit"] = "pairs/s"
            except Exception as e:  # noqa: BLE001 - UQ headline survives
                result["train_error"] = str(e)[:200]
    print(json.dumps(result))
    return result


def main():
    _enable_compile_cache()
    # The axon relay occasionally restarts (measured round 3: outage
    # windows from ~1h to several hours where even backend init hung or
    # raised UNAVAILABLE). A transient transport failure should not void
    # the round's benchmark — retry with a backoff (~20 min of patience
    # total) before giving up.
    attempts = int(os.environ.get("PULPO_BENCH_RELAY_RETRIES", "6"))
    for attempt in range(attempts):
        try:
            return _main_inner()
        except Exception as e:  # noqa: BLE001 - relay errors vary by layer
            transient = any(s in str(e) for s in (
                "Connection refused", "Connection Failed", "UNAVAILABLE",
                "transport", "crashed or restarted"))
            if not transient or attempt == attempts - 1:
                raise
            print(f"# relay error (attempt {attempt + 1}), retrying in 240s: "
                  f"{str(e)[:200]}", file=sys.stderr, flush=True)
            time.sleep(240)


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
