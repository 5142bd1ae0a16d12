"""Diagnose the round-2 persistent-cache miss for large UQ executables.

Round-2 finding (PERF.md): JAX_COMPILATION_CACHE_DIR captured the small
train/predict programs but NOT the full-res UQ executable — every bench
invocation paid the 45-115 min relay AOT compile. This probe, run on the
real TPU with a small (or proxy) config:

1. compiles the exact bench UQ program with DEBUG logging of
   jax._src.compilation_cache / jax._src.compiler / jax._src.cache_key,
   so any "not writing cache entry" decision is visible;
2. lists the cache dir before/after to confirm the write;
3. tests jax.experimental.serialize_executable.{serialize,deserialize}
   round-trip on the compiled UQ executable (the plan-B path: ship a
   preserialized executable to bench.py).

Env: PULPO_PROBE_SIZE=small|quarter|half (default small).
"""

from __future__ import annotations

import logging
import os
import pickle
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_EXPLAIN_CACHE_MISSES", "true")

logging.basicConfig(level=logging.INFO, stream=sys.stderr)
for mod in ("jax._src.compilation_cache", "jax._src.compiler",
            "jax._src.cache_key", "jax.experimental.compilation_cache"):
    logging.getLogger(mod).setLevel(logging.DEBUG)

SIZES = {
    "small": (32, 32, 32),
    "quarter": (40, 48, 56),
    "half": (80, 96, 112),
}


def cache_listing():
    d = os.environ["JAX_COMPILATION_CACHE_DIR"]
    try:
        return sorted(
            (f, os.path.getsize(os.path.join(d, f))) for f in os.listdir(d)
        )
    except FileNotFoundError:
        return []


def main():
    size = SIZES[os.environ.get("PULPO_PROBE_SIZE", "small")]
    print(f"# probe size {size}", file=sys.stderr, flush=True)

    import jax
    import jax.numpy as jnp

    # the axon sitecustomize imports jax at interpreter startup, so env
    # vars set in this module are too late — update the config directly
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    print(f"# backend {jax.default_backend()} devices {jax.devices()}",
          file=sys.stderr, flush=True)
    print(f"# runtime_type {jax.devices()[0].client.runtime_type}",
          file=sys.stderr, flush=True)

    from pulpo_tpu.config import PULPoConfig
    from pulpo_tpu.models.api import PULPoModel
    from pulpo_tpu.uq.predict import _jitted_uq

    cfg = PULPoConfig(
        input_size=size, total_levels=5, latent_levels=4, n0=32,
        compute_dtype="bfloat16", dataset="oasis",
    )
    model = PULPoModel(cfg, dtype=jnp.bfloat16)
    t0 = time.time()
    variables = model.init(jax.random.key(0))
    jax.block_until_ready(variables)
    print(f"# init {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    before = dict(cache_listing())
    print(f"# cache before: {before}", file=sys.stderr, flush=True)

    x = jnp.zeros((1, *size, 1), jnp.float32)
    y = jnp.ones((1, *size, 1), jnp.float32)
    rng = jax.random.key(0)

    # same jit wrapper the bench uses
    fn = _jitted_uq(model, 32, False, 8, False, False)
    t0 = time.time()
    out = fn(variables, x, y, rng)
    jax.block_until_ready(out.output_std[0])
    print(f"# uq compile+run {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    after = dict(cache_listing())
    new = {k: v for k, v in after.items() if k not in before}
    print(f"# cache new entries: {new}", file=sys.stderr, flush=True)

    # plan B: explicit AOT serialize of the compiled executable
    try:
        from jax.experimental import serialize_executable as se

        # grab the underlying compiled object from the jit cache
        from pulpo_tpu.uq.predict import _uq_impl  # noqa: F401
        import functools

        def f(v, x, y, r, m, lm):
            return _uq_impl(model, v, x, y, 32, r, m, 8,
                            keep_samples=False, lm=lm)

        jf = jax.jit(f)
        t0 = time.time()
        lowered = jf.lower(variables, x, y, rng, None, None)
        compiled = lowered.compile()
        print(f"# explicit lower+compile {time.time()-t0:.1f}s",
              file=sys.stderr, flush=True)
        t0 = time.time()
        payload = se.serialize(compiled)
        blob = pickle.dumps(payload)
        print(f"# serialize_executable OK: {len(blob)/1e6:.1f} MB "
              f"in {time.time()-t0:.1f}s", file=sys.stderr, flush=True)
        with open("/tmp/probe_exec.pkl", "wb") as fh:
            fh.write(blob)
        t0 = time.time()
        unpickled = pickle.loads(blob)
        loaded = se.deserialize_and_load(*unpickled)
        out2 = loaded(variables, x, y, rng, None, None)
        jax.block_until_ready(out2.output_std[0])
        print(f"# deserialize+run OK in {time.time()-t0:.1f}s",
              file=sys.stderr, flush=True)
        ok = bool(jnp.allclose(out2.output_std[0], out.output_std[0],
                               atol=1e-5))
        print(f"# roundtrip equal: {ok}", file=sys.stderr, flush=True)
    except Exception as e:
        print(f"# serialize_executable FAILED: {type(e).__name__}: {e}",
              file=sys.stderr, flush=True)

    print("PROBE_DONE", flush=True)


if __name__ == "__main__":
    main()
