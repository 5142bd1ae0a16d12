"""Channel-padding variants for the decode's narrow convs (round 3).

probe_conv4 killed im2col (27-view concat lowers terribly) and showed
the 64/96-wide convs near their ceiling. Remaining slow shapes at the
l0 8-row operating point: 3->32 (2.0 TF/s, 17.9 ms), 32->32 (14.3
TF/s, ~27 ms), 16->96 (10 ms). This probe asks whether zero-padding
JUST the narrow side to the next sublane/lane-friendly width moves the
emitter to a faster mode (pad FLOPs are wasted, so the useful rate =
true FLOPs / time must beat the native row).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_conv5.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

SHAPE = (8, 80, 96, 112)
ITERS = 12


def conv_xla(x, k):
    nd = x.ndim
    lhs = (0, nd - 1) + tuple(range(1, nd - 1))
    rhs = (nd - 1, nd - 2) + tuple(range(0, nd - 2))
    dn = jax.lax.ConvDimensionNumbers(lhs, rhs, lhs)
    return jax.lax.conv_general_dilated(x, k, (1, 1, 1), "SAME",
                                        dimension_numbers=dn)


def timeit(tag, fn, x, k, flops):
    @jax.jit
    def chain(x, k):
        y = x
        for _ in range(ITERS):
            y = fn(y[..., : x.shape[-1]] if y.shape[-1] >= x.shape[-1] else
                   jnp.concatenate([y] * (x.shape[-1] // y.shape[-1] + 1),
                                   -1)[..., : x.shape[-1]], k)
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
    print(f"{tag:28s} compile {comp:6.1f}s  {per * 1e3:8.2f} ms/conv  "
          f"useful {flops / per / 1e12:6.1f} TF/s", flush=True)
    return per


def main():
    rows = 1
    for s in SHAPE:
        rows *= s
    key = jax.random.key(0)

    def mk(cin, cout):
        x = jax.random.normal(jax.random.fold_in(key, cin * 1000 + cout),
                              (*SHAPE, cin), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(key, cin + cout),
                              (3, 3, 3, cin, cout), jnp.bfloat16) * 0.1
        flops = 2 * rows * 27 * cin * cout
        return x, k, flops

    def padded(k_true, pin, pout):
        def f(xx, kk):
            if pin > kk.shape[3]:
                xx = jnp.pad(xx, ((0, 0),) * 4 + ((0, pin - kk.shape[3]),))
            kk = jnp.pad(kk, ((0, 0),) * 3 + (
                (0, pin - kk.shape[3]), (0, pout - kk.shape[4])))
            return conv_xla(xx, kk)[..., : k_true.shape[4]]
        return f

    for cin, cout, variants in (
            (3, 32, ((8, 32), (16, 32), (3, 128), (8, 128))),
            (32, 32, ((32, 64), (32, 128), (64, 64))),
            (16, 96, ((16, 128), (32, 96), (32, 128))),
    ):
        x, k, fl = mk(cin, cout)
        timeit(f"{cin}->{cout} xla", conv_xla, x, k, fl)
        for pin, pout in variants:
            timeit(f"{cin}->{cout} pad {pin}x{pout}", padded(k, pin, pout),
                   x, k, fl)
    print("PROBE_CONV5_DONE", flush=True)


if __name__ == "__main__":
    main()
