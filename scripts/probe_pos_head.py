"""Hardware probe: fused posterior head vs the XLA composition (v5e).

Times posterior_head_fused (kernels/pos_head.py — up_block ConvSequence
+ split merge ConvSequence + mu/sigma heads in one MXU kernel) at the
flagship decode's l0 (8 rows, 80x96x112, c_fb=16, n_up=96, n_merge=64)
and l1 (8 rows, 40x48x56, n_merge=128) shapes, bf16, and checks
exactness vs posterior_head_xla on-chip. PERF.md's composed
decomposition for the unfused path: up_block 0.089 s + merge 0.111 s
per 8-row chunk at l0 (34-45 TF/s composed vs the 77 TF/s per-shape
ceiling); the fused kernel projects ~9-12 ms/row-slice-chain.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
  python scripts/probe_pos_head.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pulpo_tpu.kernels.pos_head import posterior_head_fused, posterior_head_xla

ITERS = 8


def params(key, c_fb, n_up, n_merge, zd=3):
    ks = jax.random.split(key, 40)
    it = iter(range(40))
    r = lambda shape, s=1.0: jax.random.normal(ks[next(it)], shape) * s

    def unit(pre, n, kshape, cout):
        return {
            f"{pre}k{n}": r(kshape, 0.15),
            f"{pre}b{n}": r((cout,), 0.1),
            f"{pre}mean{n}": r((cout,), 0.3),
            f"{pre}var{n}": jax.nn.softplus(r((cout,))) + 0.1,
            f"{pre}scale{n}": r((cout,)) + 1.0,
            f"{pre}bias{n}": r((cout,), 0.2),
        }

    p = {}
    p.update(unit("u", 1, (3, 3, 3, c_fb, n_up), n_up))
    p.update(unit("u", 2, (3, 3, 3, n_up, n_up), n_up))
    p.update(unit("m", 1, (3, 3, 3, n_up, n_merge), n_merge))
    p.update(unit("m", 2, (3, 3, 3, n_merge, n_merge), n_merge))
    p["hkmu"] = r((1, 1, 1, n_merge, zd), 0.5)
    p["hbmu"] = r((zd,), 0.1)
    p["hksig"] = r((1, 1, 1, n_merge, zd), 0.5)
    p["hbsig"] = r((zd,), 0.1)
    return p


def timeit(tag, fn, fb, y2, p, flops):
    @jax.jit
    def chain(fb, y2, p):
        x = fb
        out = None
        for _ in range(ITERS):
            mu, sg = fn(x, y2, p)
            out = (mu, sg)
            # data dependency: feed a whiff of the output back in
            x = fb + jnp.pad(
                (mu * 1e-6).astype(fb.dtype),
                ((0, 0),) * 4 + ((0, fb.shape[-1] - mu.shape[-1]),))
        return (out[0].astype(jnp.float32).mean()
                + out[1].astype(jnp.float32).mean())

    t0 = time.perf_counter()
    float(jax.device_get(chain(fb, y2, p)))
    comp = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jax.device_get(chain(fb, y2, p)))
        ts.append((time.perf_counter() - t0) / ITERS)
    per = min(ts)
    print(f"{tag:20s} compile {comp:6.1f}s  {per * 1e3:8.2f} ms/head  "
          f"{flops / per / 1e12:6.1f} TF/s", flush=True)
    return per


def main():
    key = jax.random.key(7)
    for shape, n_merge in (((80, 96, 112), 64), ((40, 48, 56), 128)):
        R, B, c_fb, n_up, zd = 8, 4, 16, 96, 3
        vox = R * shape[0] * shape[1] * shape[2]
        fl = 2 * vox * (27 * (c_fb * n_up + n_up * n_up + n_up * n_merge
                              + n_merge * n_merge) + n_merge * 2 * zd)
        dt = jnp.bfloat16
        fb = jax.random.normal(jax.random.fold_in(key, 1), (R, *shape, c_fb), dt)
        y2 = jax.random.normal(jax.random.fold_in(key, 2),
                               (B, *shape, n_merge), dt)
        p = params(jax.random.fold_in(key, 3), c_fb, n_up, n_merge)
        got = jax.jit(posterior_head_fused)(fb, y2, p)
        ref = jax.jit(posterior_head_xla)(fb, y2, p)
        got, ref = jax.device_get((got, ref))
        for name, a, b in (("mu", got[0], ref[0]), ("sigma", got[1], ref[1])):
            err = np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))
            sc = np.abs(np.asarray(b, np.float32)).max()
            print(f"{shape} nm={n_merge} {name}: max|diff| {err.max():.3e} "
                  f"(|ref|max {sc:.3e})", flush=True)
        t_x = timeit(f"xla  {shape[0]} nm{n_merge}", posterior_head_xla,
                     fb, y2, p, fl)
        t_f = timeit(f"fused {shape[0]} nm{n_merge}", posterior_head_fused,
                     fb, y2, p, fl)
        print(f"  speedup {t_x / t_f:.2f}x", flush=True)


if __name__ == "__main__":
    main()
