"""Hardware probe: MXU im2col narrow conv vs the XLA conv (v5e).

Times conv3d_narrow_mxu at the VelocityField head's l0 shape
(8 rows, 80x96x112, 3->32) and checks exactness vs the XLA conv.
probe_conv5 showed 17.7 ms is the VPU f32 ceiling for the XLA
formulation; the MXU kernel projects ~6-9 ms (grid overhead bound).

Run: PYTHONPATH=/root/repo:/root/.axon_site \
  python scripts/probe_conv_narrow.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pulpo_tpu.attic.conv_narrow import conv3d_narrow_mxu
from pulpo_tpu.ops.conv import _conv_xla

SHAPE = (8, 80, 96, 112)
ITERS = 12


def timeit(tag, fn, x, k, flops):
    @jax.jit
    def chain(x, k):
        y = x
        for _ in range(ITERS):
            y = fn(y[..., : x.shape[-1]], k)
        return y.astype(jnp.float32).mean()

    t0 = time.perf_counter()
    float(jax.device_get(chain(x, k)))
    comp = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jax.device_get(chain(x, k)))
        ts.append((time.perf_counter() - t0) / ITERS)
    per = min(ts)
    print(f"{tag:22s} compile {comp:6.1f}s  {per * 1e3:8.2f} ms/conv  "
          f"{flops / per / 1e12:6.1f} TF/s", flush=True)
    return per


def main():
    rows = 1
    for s in SHAPE:
        rows *= s
    for cin, cout, dt in ((3, 32, jnp.bfloat16), (3, 32, jnp.float32)):
        x = jax.random.normal(jax.random.key(1), (*SHAPE, cin), dt)
        k = jax.random.normal(jax.random.key(2), (3, 3, 3, cin, cout),
                              dt) * 0.1
        fl = 2 * rows * 27 * cin * cout
        # exactness first (jitted, fetched)
        out = jax.jit(conv3d_narrow_mxu)(x, k)
        ref = jax.jit(_conv_xla)(x, k)
        d = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                  - ref.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
        print(f"{cin}->{cout} {dt.__name__}: maxdiff {d:.3e} "
              f"(scale {scale:.2f})", flush=True)
        assert d <= (0.1 if dt == jnp.bfloat16 else 1e-4) * scale, d
        timeit(f"{cin}->{cout} {dt.__name__} xla", _conv_xla, x, k, fl)
        timeit(f"{cin}->{cout} {dt.__name__} mxu",
               lambda a, b: conv3d_narrow_mxu(a, b), x, k, fl)
    print("PROBE_CONV_NARROW_DONE", flush=True)


if __name__ == "__main__":
    main()
