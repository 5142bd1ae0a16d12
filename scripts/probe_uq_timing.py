"""Decompose the full-res UQ wall time: relay dispatch overhead vs
encode vs per-sample decode vs warp gathers.

Context (round 3): the first valid fetch-forced full-res bench measured
0.037 pairs/s (27 s/pair) — 1% of the measured 171 TFLOP/s matmul peak.
This probe separates per-program relay overhead from on-chip execution
and finds which stage burns the time. Every timing ends in a host fetch
(the relay ignores block_until_ready).

Run on the TPU: PYTHONPATH=/root/repo:/root/.axon_site python
scripts/probe_uq_timing.py [--size half|full]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="full", choices=["full", "half"])
    ap.add_argument("--b", type=int, default=2)
    ap.add_argument("--chunk", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pulpo_tpu.config import PULPoConfig
    from pulpo_tpu.models.api import PULPoModel
    from pulpo_tpu.models.pulpo import PULPoModule
    from pulpo_tpu.ops.warp import integrate_svf, warp_image
    from pulpo_tpu.uq.predict import _uq_impl

    size = (160, 192, 224) if args.size == "full" else (80, 96, 112)
    cfg = PULPoConfig(input_size=size, total_levels=5, latent_levels=4,
                      n0=32, compute_dtype="bfloat16", dataset="oasis")
    model = PULPoModel(cfg, dtype=jnp.bfloat16)

    fetch = lambda v: float(jax.device_get(
        jnp.asarray(v).astype(jnp.float32).ravel()[0]))

    def timed(name, fn, *calls):
        """fn jitted; calls = list of arg tuples, chained by re-keying.
        Times each call separately (fetch after each)."""
        ts = []
        for i, c in enumerate(calls):
            t0 = time.perf_counter()
            out = fn(*c)
            leaf = jax.tree.leaves(out)[0]
            fetch(leaf)
            ts.append(time.perf_counter() - t0)
        print(f"{name}: " + " ".join(f"{t:.2f}s" for t in ts), flush=True)
        return ts

    variables = model.init(jax.random.key(0))
    x = jnp.asarray(jax.random.uniform(jax.random.key(1), (args.b, *size, 1)))
    y = jnp.asarray(jax.random.uniform(jax.random.key(2), (args.b, *size, 1)))

    # 1) the full UQ program (same as bench run1's): 3 warm calls
    def uq(v, xx, yy, r):
        res = _uq_impl(model, v, xx, yy, 32, r, None, args.chunk)
        return res.output_std[0]

    juq = jax.jit(uq)
    timed("uq_full(call1=compile?,2,3)", juq,
          (variables, x, y, jax.random.key(3)),
          (variables, x, y, jax.random.key(4)),
          (variables, x, y, jax.random.key(5)))

    # 2) encode alone
    def enc(v, xx, yy):
        acts = model.module.apply(v, xx, yy, train=False,
                                  method=PULPoModule.encode)
        return acts[4]

    jenc = jax.jit(enc)
    timed("encode(call1,2)", jenc, (variables, x, y), (variables, x, y))

    # 3) one chunk decode (4 samples)
    acts = model.module.apply(variables, x, y, train=False,
                              method=PULPoModule.encode)

    def dec(v, xx, a, ks):
        outs = model.module.apply(v, xx, a, False, False,
                                  method=PULPoModule.decode,
                                  n_samples=args.chunk, sample_keys=ks)
        return outs[7][0]

    jdec = jax.jit(dec)
    ks1 = jax.random.split(jax.random.key(6), args.chunk)
    ks2 = jax.random.split(jax.random.key(7), args.chunk)
    timed("decode_chunk(call1,2)", jdec,
          (variables, x, acts, ks1), (variables, x, acts, ks2))

    # 4) full-res warp gather alone (8 corners, B*chunk dfs)
    df = jax.random.uniform(jax.random.key(8),
                            (args.b * args.chunk, *size, 3),
                            jnp.float32, -5.0, 5.0)

    jwarp = jax.jit(lambda im, d: warp_image(im, d))
    timed("warp_fullres_x8samples(call1,2)", jwarp, (x, df), (x, df))

    # 5) level-0 SVF integration, XLA vs Pallas (valid timing this time)
    l0 = tuple(-(-s // 2) for s in size)
    vec = jax.random.uniform(jax.random.key(9),
                             (args.b * args.chunk, *l0, 3),
                             jnp.float32, -0.3, 0.3)
    jint_x = jax.jit(lambda v: integrate_svf(v, 7))
    timed("vecint_xla_l0(call1,2)", jint_x, (vec,), (vec,))
    if not os.environ.get("PULPO_NO_PALLAS_WARP"):
        from pulpo_tpu.kernels.warp_local import integrate_svf_pallas

        jint_p = jax.jit(lambda v: integrate_svf_pallas(v, 7))
        timed("vecint_pallas_l0(call1,2)", jint_p, (vec,), (vec,))

    print("PROBE_UQ_TIMING_DONE", flush=True)


if __name__ == "__main__":
    main()
