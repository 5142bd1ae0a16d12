"""Round-5 conv-backward probe: size the dx-as-forward-conv fix and a
dk-as-one-conv candidate at the full-res DownPath shapes.

Rows (each fetch-forced, min of 3 warm):
  1. fwd+bwd through conv3d_tapgrad (CURRENT: dx forward-conv + dk
     tap-loop) at 2->32 and 32->32 — compare against the round-5
     bisect's isolated rows of the OLD formulation.
  2. dk alone via the 27-tap fori_loop (current).
  3. dk alone via ONE conv_general_dilated with permuted dimension
     numbers (ci as batch, b as contraction feature, g as the filter).
     If XLA picks a sane emitter this replaces the tap loop's ~24 GB
     of per-tap re-reads; if it picks the round-3 tap-expanded layouts
     it will OOM/crawl — measured either way.

Run: PYTHONPATH=/root/repo:/root/.axon_site \
  python scripts/probe_conv_bwd2.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pulpo_tpu.ops.conv import conv3d_tapgrad

ITERS = 3
SHAPE = (160, 192, 224)


def timed(tag, fn, *args):
    t0 = time.perf_counter()
    float(jax.device_get(fn(*args)))
    comp = time.perf_counter() - t0
    ts = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        float(jax.device_get(fn(*args)))
        ts.append(time.perf_counter() - t0)
    print(f"{tag:34s} compile+1 {comp:7.1f}s  warm {min(ts):6.3f}s "
          f"({' '.join(f'{t:.3f}' for t in ts)})", flush=True)


def dk_conv(x, g, K=3):
    p = (K - 1) // 2
    xp = jnp.pad(x, ((0, 0),) + ((p, p),) * 3 + ((0, 0),))
    dn = jax.lax.ConvDimensionNumbers(
        lhs_spec=(4, 0, 1, 2, 3),   # xp: batch=ci, feature=b
        rhs_spec=(4, 0, 1, 2, 3),   # g:  out_feat=co, in_feat=b
        out_spec=(0, 4, 1, 2, 3),   # out: (ci, K, K, K, co)
    )
    out = jax.lax.conv_general_dilated(
        xp, g, window_strides=(1, 1, 1), padding="VALID",
        dimension_numbers=dn, preferred_element_type=jnp.float32)
    return jnp.transpose(out, (1, 2, 3, 0, 4))  # (K, K, K, ci, co)


def dk_loop(x, g, K=3):
    """The current dk tap loop, isolated (mirrors ops/conv._tapgrad_bwd)."""
    p = (K - 1) // 2
    b = x.shape[0]
    spatial = x.shape[1:-1]
    ci, co = x.shape[-1], g.shape[-1]
    n = b
    for s in spatial:
        n *= s
    gr = g.reshape(n, co)
    xp = jnp.pad(x, ((0, 0),) + ((p, p),) * 3 + ((0, 0),))

    def body(t, dk_acc):
        tz = t // (K * K)
        ty = (t // K) % K
        tx = t % K
        sl_x = jax.lax.dynamic_slice(
            xp, (0, tz, ty, tx, 0), (b, *spatial, ci)).reshape(n, ci)
        dk_t = jax.lax.dot_general(
            sl_x, gr, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return jax.lax.dynamic_update_index_in_dim(dk_acc, dk_t, t, 0)

    return jax.lax.fori_loop(0, K**3, body,
                             jnp.zeros((K**3, ci, co), jnp.float32))


def main():
    key = jax.random.key(3)
    for cin, cout in ((2, 32), (32, 32)):
        x = jax.random.normal(key, (1, *SHAPE, cin), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(key, 1),
                              (3, 3, 3, cin, cout), jnp.bfloat16) * 0.1
        g = jax.random.normal(jax.random.fold_in(key, 2),
                              (1, *SHAPE, cout), jnp.bfloat16)

        @jax.jit
        def fb(x, k):
            def f(x, k):
                y = conv3d_tapgrad(x, k)
                return (y.astype(jnp.float32) ** 2).sum()

            l, (dx, dkk) = jax.value_and_grad(f, argnums=(0, 1))(x, k)
            return l + (dx.astype(jnp.float32) ** 2).sum() + (
                dkk.astype(jnp.float32) ** 2).sum()

        timed(f"fwd+bwd NEW {cin}->{cout}", fb, x, k)

        @jax.jit
        def dkl(x, g):
            return (dk_loop(x, g) ** 2).sum()

        timed(f"dk tap-loop {cin}->{cout}", dkl, x, g)

        @jax.jit
        def dkc(x, g):
            return (dk_conv(x, g) ** 2).sum()

        timed(f"dk one-conv {cin}->{cout}", dkc, x, g)

        # correctness: one small CPU-checkable equality on-device
        d1 = jax.jit(dk_loop)(x, g)
        d2 = jax.jit(dk_conv)(x, g).reshape(27, cin, cout)
        md = float(jax.device_get(jnp.max(jnp.abs(d1 - d2))))
        mx = float(jax.device_get(jnp.max(jnp.abs(d1))))
        print(f"# dk equality {cin}->{cout}: maxdiff {md:.3e} (max {mx:.3e})",
              flush=True)
    print("PROBE_CONV_BWD2_DONE", flush=True)


if __name__ == "__main__":
    main()
