"""Post-cascade UQ sweep: decode-chunk cost vs chunk size, full UQ-32
pairs/s vs (B, chunk), with the halo-cascade warp active in the decode.

Context: with XLA gather warps the full-res decode chunk (B=2, chunk 4)
ran 6.24 s, ~5.5 s of it per-voxel gathers on the scalar core
(/tmp/uq_timing.log). The cascade (kernels/warp_halo.py) replaces the
level-0..2 warps; this probe measures what is left and whether bigger
chunks/batches amortize it.

Run on the TPU: PYTHONPATH=/root/repo:/root/.axon_site \
  python scripts/probe_uq_sweep.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pulpo_tpu.config import PULPoConfig
    from pulpo_tpu.models.api import PULPoModel
    from pulpo_tpu.models.pulpo import PULPoModule
    from pulpo_tpu.uq.predict import _uq_impl

    size = (160, 192, 224)
    cfg = PULPoConfig(input_size=size, total_levels=5, latent_levels=4,
                      n0=32, compute_dtype="bfloat16", dataset="oasis")
    model = PULPoModel(cfg, dtype=jnp.bfloat16)

    fetch = lambda v: float(jax.device_get(
        jnp.asarray(v).astype(jnp.float32).ravel()[0]))

    def timed(name, fn, calls):
        ts = []
        for c in calls:
            t0 = time.perf_counter()
            out = fn(*c)
            fetch(jax.tree.leaves(out)[0])
            ts.append(time.perf_counter() - t0)
        print(f"{name}: " + " ".join(f"{t:.2f}s" for t in ts), flush=True)
        return ts

    variables = model.init(jax.random.key(0))

    # 1) decode-chunk cost vs chunk at B=2 (cascade active via
    #    warp_image_auto). call1 includes compile.
    x = jnp.asarray(jax.random.uniform(jax.random.key(1), (2, *size, 1)))
    y = jnp.asarray(jax.random.uniform(jax.random.key(2), (2, *size, 1)))
    acts = model.module.apply(variables, x, y, train=False,
                              method=PULPoModule.encode)

    for chunk in (4,):
        def dec(v, xx, a, ks):
            outs = model.module.apply(v, xx, a, False, False,
                                      method=PULPoModule.decode,
                                      n_samples=chunk, sample_keys=ks)
            return outs[7][0]

        jdec = jax.jit(dec)
        try:
            timed(f"decode_chunk{chunk}_B2", jdec,
                  [(variables, x, acts,
                    jax.random.split(jax.random.key(6 + i), chunk))
                   for i in range(3)])
        except Exception as e:  # OOM boundary is a datapoint, not a crash
            print(f"decode_chunk{chunk}_B2: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    # 2) full UQ-32 at the bench operating points
    for b, chunk in ((2, 4),):
        xb = jnp.asarray(jax.random.uniform(jax.random.key(3), (b, *size, 1)))
        yb = jnp.asarray(jax.random.uniform(jax.random.key(4), (b, *size, 1)))

        def uq(v, xx, yy, r, _chunk=chunk):
            res = _uq_impl(model, v, xx, yy, 32, r, None, _chunk)
            return res.output_std[0]

        juq = jax.jit(uq)
        try:
            ts = timed(f"uq32_B{b}_chunk{chunk}", juq,
                       [(variables, xb, yb, jax.random.key(10 + i))
                        for i in range(3)])
            warm = min(ts[1:])
            print(f"  -> {b / warm:.3f} pairs/s", flush=True)
        except Exception as e:
            print(f"uq32_B{b}_chunk{chunk}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    print("PROBE_UQ_SWEEP_DONE", flush=True)


if __name__ == "__main__":
    main()
