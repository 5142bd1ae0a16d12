"""Measure the chip's real achievable bf16 matmul throughput.

Settles the roofline's peak-FLOPs question empirically (the advertised
v5e peak is 197 TFLOP/s bf16; measured model throughput in rounds 1-2
implied more than that under the HLO FLOP count, so either the relay
chip is faster than advertised or those measurements were inflated).

Chained z_{i+1} = z_i @ a (data dependency) so the relay cannot overlap
or cache the timed calls; one jit with lax.fori_loop keeps dispatch off
the critical path.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n = int(os.environ.get("MM_N", "8192"))
    iters = int(os.environ.get("MM_ITERS", "64"))
    dtype = jnp.bfloat16

    k = jax.random.key(0)
    a = (jax.random.normal(k, (n, n), jnp.float32) / n**0.5).astype(dtype)
    z0 = jnp.eye(n, dtype=dtype)

    @jax.jit
    def chain(z, a, iters):
        def body(_, z):
            return jnp.tanh(z @ a)  # tanh keeps values bounded, cost ~0
        return jax.lax.fori_loop(0, iters, body, z)

    def fetch(x):
        """Force real completion: under the axon relay,
        jax.block_until_ready returns immediately (measured round 3:
        64 chained 8k matmuls "completed" in 0.000s) — only a host
        TRANSFER of a value data-dependent on the result proves the
        computation ran. Every timing on this relay must end in one."""
        import numpy as np

        return float(np.asarray(jax.device_get(x[0, 0])))

    t0 = time.time()
    out = chain(z0, a, 2)
    fetch(out)
    print(f"# warmup+compile {time.time()-t0:.1f}s", file=sys.stderr, flush=True)

    for it in (iters, iters * 4):
        t0 = time.time()
        out = chain(z0, a, it)
        fetch(out)
        dt = time.time() - t0
        flops = 2 * n**3 * it
        print(f"bf16 {n}x{n} matmul chain x{it}: {dt:.3f}s "
              f"-> {flops/dt/1e12:.1f} TFLOP/s", flush=True)

    # f32 for comparison (half the MXU rate on v5e)
    a32 = a.astype(jnp.float32)
    z32 = z0.astype(jnp.float32)
    out = chain(z32, a32, 2)
    fetch(out)
    t0 = time.time()
    out = chain(z32, a32, iters)
    fetch(out)
    dt = time.time() - t0
    flops = 2 * n**3 * iters
    print(f"f32  {n}x{n} matmul chain x{iters}: {dt:.3f}s "
          f"-> {flops/dt/1e12:.1f} TFLOP/s", flush=True)


if __name__ == "__main__":
    main()
