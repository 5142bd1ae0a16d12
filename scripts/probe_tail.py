"""Tail + DCE decomposition of the flagship UQ program (round 3).

bench.py fetches only output_std[0].mean(); jax/XLA DCE can then drop
everything not feeding it: the mean-SVF combine/re-warp, levels 1..K-1
std maps and their full-res warps, entropy, mse, the first-chunk
retention slot. This probe times, at the bench operating point (B=4,
chunk 2):

  enc            encode alone
  std(N)         the bench's fetch (output_std[0] only), N = 2, 4
  all(N)         a fetch forcing EVERY UQResult leaf, N = 2, 4

and reads off body/chunk and encode+tail for both fetch styles. If
all() >> std(), the bench underreports the workload and must be fixed
to fetch everything.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_tail.py
"""
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
from pulpo_tpu.uq.predict import _uq_impl

B = 4
CHUNK = 2
ITERS = 3


def timeit(tag, fn, *args):
    t0 = time.perf_counter()
    float(jax.device_get(fn(*args, 0)))
    comp = time.perf_counter() - t0
    ts = []
    for i in range(1, ITERS + 1):
        t0 = time.perf_counter()
        float(jax.device_get(fn(*args, i)))
        ts.append(time.perf_counter() - t0)
    warm = min(ts)
    print(f"{tag:22s} compile+1 {comp:7.1f}s  warm {warm:7.3f}s  "
          f"({' '.join(f'{t:.2f}' for t in ts)})", flush=True)
    return warm


def main():
    cfg = PULPoConfig(input_size=(160, 192, 224), total_levels=5,
                      latent_levels=4, n0=32, dataset="synthetic",
                      compute_dtype="bfloat16")
    model = PULPoModel(cfg, dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0))
    x = jax.random.uniform(jax.random.key(6), (B, *cfg.input_size, 1), jnp.float32)
    y = jax.random.uniform(jax.random.key(7), (B, *cfg.input_size, 1), jnp.float32)
    base = jax.random.key(2)

    @jax.jit
    def enc(v, xx, yy, i):
        acts = model.module.apply(v, xx + jnp.float32(i) * 0, yy, train=False,
                                  method=PULPoModule.encode)
        return acts[4].mean().astype(jnp.float32)

    t_enc = timeit(f"encode(B={B})", enc, variables, x, y)

    def uq_fn(N, fetch_all):
        @jax.jit
        def run(v, xx, yy, i):
            key = jax.random.fold_in(base, i)
            res = _uq_impl(model, v, xx, yy, N, key, None, CHUNK)
            if not fetch_all:
                return res.output_std[0].mean().astype(jnp.float32)
            tot = jnp.float32(0.0)
            for leaf in jax.tree.leaves(res):
                tot = tot + leaf.astype(jnp.float32).mean()
            return tot
        return run

    t_std2 = timeit("std(N=2)", uq_fn(2, False), variables, x, y)
    t_std4 = timeit("std(N=4)", uq_fn(4, False), variables, x, y)
    t_all2 = timeit("all(N=2)", uq_fn(2, True), variables, x, y)
    t_all4 = timeit("all(N=4)", uq_fn(4, True), variables, x, y)

    body_std = t_std4 - t_std2
    body_all = t_all4 - t_all2
    tail_std = t_std2 - body_std
    tail_all = t_all2 - body_all
    n_chunks = 32 // CHUNK
    print(f"\nbody/chunk   std {body_std:.3f}s   all {body_all:.3f}s")
    print(f"encode+tail  std {tail_std:.3f}s   all {tail_all:.3f}s  "
          f"(encode alone {t_enc:.3f}s)")
    print(f"DCE'd work per call: tail {tail_all - tail_std:+.3f}s, "
          f"body {(body_all - body_std) * n_chunks:+.3f}s over {n_chunks} chunks")
    proj_std = tail_std + n_chunks * body_std
    proj_all = tail_all + n_chunks * body_all
    print(f"projected N=32 call: std {proj_std:.2f}s ({B / proj_std:.4f} pairs/s)"
          f"   all {proj_all:.2f}s ({B / proj_all:.4f} pairs/s)")
    print("PROBE_TAIL_DONE", flush=True)


if __name__ == "__main__":
    main()
