"""Conv rates for the decode's remaining unmeasured shapes (round 3).

probe_conv2/3 measured 96->96 (pad win), 16->96, 3->32, 32->32 at l0.
The merge block at l0 is 64-wide (num_channels[1] == 64): conv_a 96->64,
conv_b/conv2 64->64 — never measured. Also tests the im2col+matmul
formulation for narrow-INPUT convs (3->32, 16->96): 27 shifted slices
concatenated then one (rows, 27*cin) x (27*cin, cout) dot — MXU-friendly
K where XLA's conv emitter runs at 2-32 TF/s.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_conv4.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

SHAPE = (8, 80, 96, 112)  # 8 rows at l0 latent res
ITERS = 12


def conv_xla(x, k):
    nd = x.ndim
    lhs = (0, nd - 1) + tuple(range(1, nd - 1))
    rhs = (nd - 1, nd - 2) + tuple(range(0, nd - 2))
    dn = jax.lax.ConvDimensionNumbers(lhs, rhs, lhs)
    return jax.lax.conv_general_dilated(x, k, (1, 1, 1), "SAME",
                                        dimension_numbers=dn)


def conv_im2col(x, k):
    kz, ky, kx, cin, cout = k.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    B, D, H, W, _ = x.shape
    views = [xp[:, dz:dz + D, dy:dy + H, dx:dx + W, :]
             for dz in range(3) for dy in range(3) for dx in range(3)]
    col = jnp.concatenate(views, axis=-1)
    y = jax.lax.dot_general(
        col.reshape(-1, 27 * cin), k.reshape(27 * cin, cout),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return y.astype(x.dtype).reshape(B, D, H, W, cout)


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
          f"{flops / per / 1e12:6.1f} TF/s", flush=True)
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

    def padded(x, k, pin, pout):
        def f(xx, kk):
            xx = jnp.pad(xx, ((0, 0),) * 4 + ((0, pin - kk.shape[3]),))
            kk = jnp.pad(kk, ((0, 0),) * 3 + (
                (0, pin - kk.shape[3]), (0, pout - kk.shape[4])))
            return conv_xla(xx, kk)[..., : k.shape[4]]
        return f

    for cin, cout in ((96, 64), (64, 64), (64, 96)):
        x, k, fl = mk(cin, cout)
        timeit(f"{cin}->{cout} xla", conv_xla, x, k, fl)
    x, k, fl = mk(64, 64)
    timeit("64->64 outpad128", padded(x, k, 64, 128), x, k, fl)
    timeit("64->64 pad128x128", padded(x, k, 128, 128), x, k, fl)
    for cin, cout in ((3, 32), (16, 96)):
        x, k, fl = mk(cin, cout)
        timeit(f"{cin}->{cout} xla", conv_xla, x, k, fl)
        timeit(f"{cin}->{cout} im2col", conv_im2col, x, k, fl)
    # matmul ceiling at these row counts
    a = jax.random.normal(key, (rows, 128), jnp.bfloat16)
    b = jax.random.normal(key, (128, 128), jnp.bfloat16)
    timeit("matmul rowsx128x128", lambda aa, bb: jax.lax.dot_general(
        aa, bb, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(jnp.bfloat16),
        a, b, 2 * rows * 128 * 128)
    print("PROBE_CONV4_DONE", flush=True)


if __name__ == "__main__":
    main()
