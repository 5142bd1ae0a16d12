"""Microbenchmark: Pallas halo-stencil VecInt vs the XLA gather VecInt.

Times 7-step scaling-and-squaring integration at the level-0 SVF
resolution of the flagship config (80x96x112, the hot VecInt shape) and
at the full set of level shapes, both implementations, on the current
default device (run on the TPU; one job at a time through the axon
relay). Iterations chain through a data dependency so the relay cannot
overlap or cache the timed calls (CLAUDE.md).

Usage: python scripts/bench_warp_kernel.py [--iters 20] [--scale 12.8]
`--scale` sets max|combined df| in voxels; after /2^7 the field starts
sub-voxel, so the Pallas branch covers the early squaring iterations
and hands over to XLA once the bound is crossed.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, vec, iters: int):
    import jax
    import jax.numpy as jnp

    jfn = jax.jit(fn)

    @jax.jit
    def perturb(v, s):
        # data-dependent chaining (relay cannot overlap/cache)
        return v * (1.0 + 0.0 * s) + 1e-7 * s

    out = jfn(vec)
    # the relay ignores block_until_ready — force completion with a host
    # fetch of a result-dependent scalar (PERF.md round 3)
    float(jax.device_get(out.mean()))
    t0 = time.perf_counter()
    s = jnp.float32(0.0)
    v = vec
    for _ in range(iters):
        out = jfn(v)
        s = out.mean()
        v = perturb(vec, s)
    float(jax.device_get(s))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--scale", type=float, default=12.8)
    ap.add_argument("--shapes", type=str, default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pulpo_tpu.kernels.warp_local import integrate_svf_pallas
    from pulpo_tpu.ops.warp import integrate_svf

    print(f"device: {jax.devices()[0]}", flush=True)

    if args.shapes:
        shapes = [tuple(int(s) for s in grp.split(",")) for grp in args.shapes.split(";")]
    else:
        # flagship level-0..3 SVF resolutions (160,192,224)/2^(l+1), ceil
        shapes = [(80, 96, 112), (40, 48, 56), (20, 24, 28), (10, 12, 14)]

    results = []
    for sp in shapes:
        key = jax.random.key(0)
        vec = jax.random.uniform(key, (1, *sp, 3), jnp.float32,
                                 minval=-args.scale, maxval=args.scale)
        t_xla = bench(lambda v: integrate_svf(v, nsteps=7), vec, args.iters)
        t_pal = bench(lambda v: integrate_svf_pallas(v, nsteps=7), vec, args.iters)
        # numerics check on device
        a = integrate_svf(vec, nsteps=7)
        b = integrate_svf_pallas(vec, nsteps=7)
        err = float(jnp.max(jnp.abs(a - b)))
        r = {"shape": sp, "xla_ms": round(t_xla * 1e3, 3),
             "pallas_ms": round(t_pal * 1e3, 3),
             "speedup": round(t_xla / t_pal, 3), "max_abs_diff": err}
        results.append(r)
        print(json.dumps(r), flush=True)
    return results


if __name__ == "__main__":
    main()
