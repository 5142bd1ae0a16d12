"""Probe: H=4 and H=5 halo warp tiers on hardware (v5e).

Round 3 capped the cascade at H=3: taps >= 10 overflowed the 16M
scoped-VMEM stack. Round 4 lifts the limit via CompilerParams
(_halo_compiler_params, taps > 8 only — flagship programs unchanged).
This probe checks whether the big tiers now compile, their exactness
vs the XLA gather, and their speed at full res (8 rows / 2 moving).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_halo45.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from pulpo_tpu.kernels.warp_halo import _warp_halo_pallas
from pulpo_tpu.ops.warp import warp_image

S = (160, 192, 224)
B, BDF = 2, 8

rng = np.random.default_rng(0)
mov = jnp.asarray(rng.standard_normal((B, *S, 1)).astype(np.float32))


def main():
    for halo in (4, 5):
        amp = halo - 0.8
        df = jnp.asarray(
            rng.uniform(-amp, amp, (BDF, *S, 3)).astype(np.float32))
        try:
            f = jax.jit(lambda m, d, h=halo: _warp_halo_pallas(m, d, h))
            t0 = time.perf_counter()
            out = f(mov, df)
            s = float(jax.device_get(out.sum()))
            print(f"H={halo}: compile+1 {time.perf_counter() - t0:.1f}s "
                  f"sum={s:.3e}", flush=True)
            ref = jax.jit(warp_image)(mov, df)
            err = float(jax.device_get(jnp.abs(out - ref).max()))
            print(f"H={halo}: maxdiff vs gather {err:.2e}", flush=True)
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(jax.device_get(f(mov, df).sum()))
                ts.append(time.perf_counter() - t0)
            print(f"H={halo}: warm {min(ts):.3f}s (all "
                  + " ".join(f"{t:.3f}" for t in ts) + ")", flush=True)
        except Exception as e:
            print(f"H={halo}: FAILED {type(e).__name__}: {str(e)[:400]}",
                  flush=True)


if __name__ == "__main__":
    main()
