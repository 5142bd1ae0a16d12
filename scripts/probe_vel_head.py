"""Hardware probe: fused VelocityField head vs the XLA composition (v5e).

Times velocity_head_fused (kernels/vel_head.py — whole head: conv
zdim->n0 + eval-BN + LReLU + conv n0->n0 + eval-BN + LReLU + 1x1) at
the flagship decode's l0 (8 rows, 80x96x112) and l1 (8 rows, 40x48x56)
shapes, bf16, and checks exactness vs velocity_head_xla on-chip.
PERF.md's HLO-diff projection for the unfused path: ~45 ms/chunk of
XLA time at l0 (17.7 ms VPU conv1 + ~26 ms 14.3TF/s conv2 + epilogues
and staging); the fused kernel projects ~12-18 ms.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
  python scripts/probe_vel_head.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pulpo_tpu.kernels.vel_head import velocity_head_fused, velocity_head_xla

ITERS = 12
N0 = 32


def params(key, zdim=3, n0=N0, ndims=3):
    ks = jax.random.split(key, 14)
    r = lambda i, shape, s=1.0: jax.random.normal(ks[i], shape) * s
    return {
        "k1": r(0, (3, 3, 3, zdim, n0), 0.3),
        "b1": r(1, (n0,), 0.1),
        "mean1": r(2, (n0,), 0.3),
        "var1": jax.nn.softplus(r(3, (n0,))) + 0.1,
        "scale1": r(4, (n0,)) + 1.0,
        "bias1": r(5, (n0,), 0.2),
        "k2": r(6, (3, 3, 3, n0, n0), 0.15),
        "b2": r(7, (n0,), 0.1),
        "mean2": r(8, (n0,), 0.3),
        "var2": jax.nn.softplus(r(9, (n0,))) + 0.1,
        "scale2": r(10, (n0,)) + 1.0,
        "bias2": r(11, (n0,), 0.2),
        "k3": r(12, (1, 1, 1, n0, ndims), 0.5),
        "b3": r(13, (ndims,), 0.1),
    }


def timeit(tag, fn, z, p, flops):
    @jax.jit
    def chain(z, p):
        y = z
        out = None
        for i in range(ITERS):
            out = fn(y, p)
            # data dependency: feed a whiff of the output back in
            y = z + (out[..., :1] * 1e-6).astype(z.dtype)
        return out.astype(jnp.float32).mean()

    t0 = time.perf_counter()
    float(jax.device_get(chain(z, p)))
    comp = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jax.device_get(chain(z, p)))
        ts.append((time.perf_counter() - t0) / ITERS)
    per = min(ts)
    print(f"{tag:18s} compile {comp:6.1f}s  {per * 1e3:8.2f} ms/head  "
          f"{flops / per / 1e12:6.1f} TF/s", flush=True)
    return per


def main():
    for shape in ((8, 80, 96, 112), (8, 40, 48, 56)):
        rows = 1
        for s in shape:
            rows *= s
        fl = 2 * rows * 27 * (3 * N0 + N0 * N0) + 2 * rows * N0 * 3
        for dt in (jnp.bfloat16,):
            z = jax.random.normal(jax.random.key(1), (*shape, 3), dt)
            p = params(jax.random.key(2))
            # exactness (jitted, fetched)
            got = jax.jit(velocity_head_fused)(z, p)
            ref = jax.jit(velocity_head_xla)(z, p)
            got, ref = jax.device_get((got, ref))
            err = np.abs(np.asarray(got, np.float32)
                         - np.asarray(ref, np.float32))
            scale = np.abs(np.asarray(ref, np.float32)).max()
            print(f"{shape} {dt.__name__}: max|diff| {err.max():.3e} "
                  f"(|ref|max {scale:.3e})", flush=True)
            t_x = timeit(f"xla  {shape[1]}", velocity_head_xla, z, p, fl)
            t_f = timeit(f"fused{shape[1]}", velocity_head_fused, z, p, fl)
            print(f"  speedup {t_x / t_f:.2f}x", flush=True)


if __name__ == "__main__":
    main()
