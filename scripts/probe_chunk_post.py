"""Post-tiering UQ cost decomposition (round 3, after the tiered VecInt
squaring landed: bench = 8.2 s/call at N=32, chunk 4, B=2).

Decomposes T(N, chunk) = encode + n_chunks * body + tail by timing the
full _uq_impl program at several (N, chunk) points, plus a decode-only
program, so we can read off:

  body(chunk=4)   = T(8,4) - T(4,4)
  encode + tail   = T(4,4) - body
  moments cost    = body - decode_only
  VecInt cost     = decode_only - decode_only(nsteps=0)
  chunk scaling   = body(8)/2 vs body(4)  via T(16,8) - T(8,8)

Run: PYTHONPATH=/root/repo:/root/.axon_site \
  python scripts/probe_chunk_post.py
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
from pulpo_tpu.models.pulpo import PULPoModule
from pulpo_tpu.uq.predict import _uq_impl

B = 2
ITERS = 3


def setup(cfg):
    model = PULPoModel(cfg, dtype=jnp.bfloat16)
    variables = model.init(jax.random.key(0))
    x = jax.random.uniform(jax.random.key(6), (B, *cfg.input_size, 1),
                           jnp.float32)
    y = jax.random.uniform(jax.random.key(7), (B, *cfg.input_size, 1),
                           jnp.float32)
    return model, variables, x, y


def timeit(tag, fn, *args):
    """Relay rules: chain via fold_in-keyed calls, fetch a dependent
    scalar each iteration (serializes calls, defeats caching)."""
    t0 = time.perf_counter()
    float(jax.device_get(fn(*args, 0)))
    comp = time.perf_counter() - t0
    ts = []
    for i in range(1, ITERS + 1):
        t0 = time.perf_counter()
        float(jax.device_get(fn(*args, i)))
        ts.append(time.perf_counter() - t0)
    warm = min(ts)
    print(f"{tag:28s} compile+1 {comp:7.1f}s  warm {warm:7.3f}s  "
          f"({' '.join(f'{t:.2f}' for t in ts)})", flush=True)
    return warm


def main():
    cfg = PULPoConfig(input_size=(160, 192, 224), total_levels=5,
                      latent_levels=4, n0=32, dataset="synthetic",
                      compute_dtype="bfloat16")
    model, variables, x, y = setup(cfg)
    base = jax.random.key(2)

    def uq_fn(N, chunk):
        @jax.jit
        def run(v, xx, yy, i):
            key = jax.random.fold_in(base, i)
            res = _uq_impl(model, v, xx, yy, N, key, None, chunk)
            return res.output_std[0].mean().astype(jnp.float32)
        return lambda v, xx, yy, i: run(v, xx, yy, i)

    # encode alone
    @jax.jit
    def enc(v, xx, yy, i):
        acts = model.module.apply(v, xx + jnp.float32(i) * 0, yy, train=False,
                                  method=PULPoModule.encode)
        return acts[4].mean().astype(jnp.float32)

    t_enc = timeit("encode(B=2)", enc, variables, x, y)

    # decode-only at chunk 4 (stochastic, post-tiering)
    def dec_fn(model_, vars_, S, tag):
        acts = jax.jit(lambda v, a, b: model_.module.apply(
            v, a, b, train=False, method=PULPoModule.encode))(vars_, x, y)

        @jax.jit
        def run(v, xx, a, i):
            ks = jax.random.split(jax.random.fold_in(base, i), S)
            outs = model_.module.apply(v, xx, a, False, False,
                                       method=PULPoModule.decode,
                                       n_samples=S, sample_keys=ks)
            return outs[7][0].mean().astype(jnp.float32)
        return timeit(tag, run, vars_, x, acts)

    t_dec4 = dec_fn(model, variables, 4, "decode_only(S=4)")

    cfg0 = dataclasses.replace(cfg, nsteps=0)
    model0, vars0, _, _ = setup(cfg0)
    t_dec4_n0 = dec_fn(model0, vars0, 4, "decode_only(S=4,nsteps=0)")

    t44 = timeit("uq(N=4,chunk=4)", uq_fn(4, 4), variables, x, y)
    t84 = timeit("uq(N=8,chunk=4)", uq_fn(8, 4), variables, x, y)
    t88 = timeit("uq(N=8,chunk=8)", uq_fn(8, 8), variables, x, y)
    t168 = timeit("uq(N=16,chunk=8)", uq_fn(16, 8), variables, x, y)

    body4 = t84 - t44
    body8 = t168 - t88
    print(f"\nbody(chunk=4)      {body4:.3f}s  ({body4 / 4:.3f}s/sample)")
    print(f"body(chunk=8)      {body8:.3f}s  ({body8 / 8:.3f}s/sample)")
    print(f"encode+tail        {t44 - body4:.3f}s  (encode alone {t_enc:.3f}s)")
    print(f"moments overhead   {body4 - t_dec4:.3f}s/chunk4")
    print(f"vecint (tiered)    {t_dec4 - t_dec4_n0:.3f}s/chunk4")
    print(f"projected N=32,c4  {t_enc + (t44 - body4 - t_enc) + 8 * body4:.2f}s")
    print("PROBE_CHUNK_POST_DONE", flush=True)


if __name__ == "__main__":
    main()
