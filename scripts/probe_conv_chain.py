"""Hardware probe: fused down-block ConvSequence vs XLA (v5e).

Times conv_chain_fused (kernels/conv_chain.py) at the flagship encode's
down_block_0 shape (B=4 rows, 160x192x224, 2 -> 32 -> 32 -> 32, bf16,
WP=256) and checks exactness vs conv_chain_xla on-chip. PERF.md's conv
table for the unfused path: the 2->32 conv runs at 1.6 TF/s (VPU-bound)
and 32->32 at 9.7 TF/s — the encode is ~0.35 s of a 10.4 s UQ call,
nearly all of it this block.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
  python scripts/probe_conv_chain.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pulpo_tpu.kernels.conv_chain import conv_chain_fused, conv_chain_xla

ITERS = 8


def stages(key, widths):
    out = []
    for i in range(len(widths) - 1):
        ks = jax.random.split(jax.random.fold_in(key, i), 6)
        cin, cout = widths[i], widths[i + 1]
        out.append({
            "k": jax.random.normal(ks[0], (3, 3, 3, cin, cout)) * 0.2,
            "b": jax.random.normal(ks[1], (cout,)) * 0.1,
            "mean": jax.random.normal(ks[2], (cout,)) * 0.3,
            "var": jax.nn.softplus(jax.random.normal(ks[3], (cout,))) + 0.1,
            "scale": jax.random.normal(ks[4], (cout,)) + 1.0,
            "bias": jax.random.normal(ks[5], (cout,)) * 0.2,
        })
    return out


def timeit(tag, fn, x, st, flops):
    @jax.jit
    def chain(x, st):
        h = x
        out = None
        for _ in range(ITERS):
            out = fn(h, st)
            h = x + (out[..., :x.shape[-1]] * 1e-6).astype(x.dtype)
        return out.astype(jnp.float32).mean()

    t0 = time.perf_counter()
    float(jax.device_get(chain(x, st)))
    comp = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jax.device_get(chain(x, st)))
        ts.append((time.perf_counter() - t0) / ITERS)
    per = min(ts)
    print(f"{tag:18s} compile {comp:6.1f}s  {per * 1e3:8.2f} ms/block  "
          f"{flops / per / 1e12:6.1f} TF/s", flush=True)
    return per


def main():
    key = jax.random.key(11)
    for widths, shape, wp in (
        ((2, 32, 32, 32), (160, 192, 224), 256),  # down_block_0, B=4
        ((2, 32, 32, 32), (80, 96, 112), 128),    # half-res variant
    ):
        B = 4
        st = stages(key, widths)
        vox = B * shape[0] * shape[1] * shape[2]
        fl = 2 * vox * 27 * sum(a * b for a, b in zip(widths, widths[1:]))
        dt = jnp.bfloat16
        x = jax.random.normal(jax.random.fold_in(key, 9),
                              (B, *shape, widths[0]), dt)
        got = jax.jit(lambda a, s: conv_chain_fused(a, s, wp=wp))(x, st)
        ref = jax.jit(conv_chain_xla)(x, st)
        got, ref = jax.device_get((got, ref))
        err = np.abs(np.asarray(got, np.float32) - np.asarray(ref, np.float32))
        sc = np.abs(np.asarray(ref, np.float32)).max()
        print(f"{shape} wp={wp}: max|diff| {err.max():.3e} "
              f"(|ref|max {sc:.3e})", flush=True)
        t_x = timeit(f"xla  {shape[0]}", conv_chain_xla, x, st, fl)
        t_f = timeit(f"fused {shape[0]}",
                     lambda a, s: conv_chain_fused(a, s, wp=wp), x, st, fl)
        print(f"  speedup {t_x / t_f:.2f}x", flush=True)


if __name__ == "__main__":
    main()
