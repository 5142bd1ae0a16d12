"""Per-op timing breakdown of the UQ decode chunk at the flagship config
(160x192x224, 5/4 levels, n0=32, bf16, chunk=4 samples x B=2 = 8 rows).

Times each hot component standalone with representative shapes + real
model weights, to locate where the non-warp decode time goes (the warp
cascade already cut the full-res transformed gather 4.5s -> ~0.1s).

Relay rules: every timing chains iterations through a data dependency
and ends in a host fetch of a dependent scalar (PERF.md round 3).

Run: PYTHONPATH=/root/repo:/root/.axon_site \
  python scripts/probe_decode_breakdown.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pulpo_tpu.config import PULPoConfig
from pulpo_tpu.models.api import PULPoModel

B, S = 2, 4  # pairs, samples per chunk -> 8 decode rows
ROWS = B * S


def timed(name, fn, *args, iters=3):
    """Chained timing: each call consumes a scalar from the previous."""
    out = fn(*args, jnp.float32(0.0))
    t0 = time.perf_counter()
    bias = jnp.float32(out.mean())  # fetchless chain seed
    float(jax.device_get(out.mean()))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for _ in range(iters):
        acc = fn(*args, acc).mean().astype(jnp.float32)
    float(jax.device_get(acc))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: compile+1 {compile_s:.2f}s warm {dt:.3f}s", flush=True)
    return dt


def main():
    cfg = PULPoConfig(input_size=(160, 192, 224), total_levels=5,
                      latent_levels=4, n0=32, dataset="synthetic",
                      compute_dtype="bfloat16")
    model = PULPoModel(cfg, dtype=jnp.bfloat16)
    t0 = time.perf_counter()
    variables = model.init(jax.random.key(0))
    print(f"init {time.perf_counter() - t0:.1f}s", flush=True)
    params = variables["params"]

    k1 = jax.random.key(1)
    bf = jnp.bfloat16

    # ---- level-0 shapes (the dominant level) ----
    l0_in = cfg.level_sizes[0]          # 80x96x112 (latent level 0 = k1)
    l1_in = cfg.level_sizes[1]          # 40x48x56
    full = cfg.input_size

    # 1) feedback resize: 16ch concat at l1 -> l0 size, 8 rows
    fb_small = jax.random.normal(k1, (ROWS, *l1_in, 16), bf)

    from pulpo_tpu.ops.resize import resize_linear

    @jax.jit
    def t_fb_resize(x, acc):
        return resize_linear(x + acc.astype(bf), l0_in).astype(jnp.float32)

    timed("fb_resize_l0 (8,40,48,56,16)->(80,96,112)", t_fb_resize, fb_small)

    # 2) up_block l0: ConvSequence 16 -> 96 -> 96 at l0, 8 rows
    from pulpo_tpu.models.blocks import ConvSequence

    fb_big = jax.random.normal(k1, (ROWS, *l0_in, 16), bf)
    ub = ConvSequence(cfg.n0 * cfg.zdim, depth=2, dtype=bf)
    ub_vars = ub.init(jax.random.key(2), fb_big, False)

    @jax.jit
    def t_upblock(v, x, acc):
        return ub.apply(v, x + acc.astype(bf), False).astype(jnp.float32)

    timed("up_block_l0 convs 16->96->96 @80x96x112 x8", t_upblock, ub_vars, fb_big)

    # 3) merge conv l0 split-weight: fb (8 rows, 96ch) + act (2 rows, 64ch)
    act = jax.random.normal(k1, (B, *l0_in, cfg.num_channels[1]), bf)
    fb96 = jax.random.normal(k1, (ROWS, *l0_in, cfg.n0 * cfg.zdim), bf)
    mb = ConvSequence(cfg.num_channels[1], depth=2, dtype=bf)
    mb_vars = mb.init(jax.random.key(3), fb96, False, act)

    @jax.jit
    def t_merge(v, f, a, acc):
        return mb.apply(v, f + acc.astype(bf), False, a).astype(jnp.float32)

    timed("merge_conv_l0 split (96fb x8 + 64act x2)->64", t_merge, mb_vars, fb96, act)

    # 4) VelocityField l0: 3 -> 32 -> 32 -> 3 convs at l0, 8 rows
    from pulpo_tpu.models.blocks import VelocityField

    z = jax.random.normal(k1, (ROWS, *l0_in, cfg.zdim), bf)
    vf = VelocityField(ndims=3, max_channels=cfg.n0, depth=cfg.cp_depth, dtype=bf)
    vf_vars = vf.init(jax.random.key(4), z, False)

    @jax.jit
    def t_vf(v, zz, acc):
        return vf.apply(v, zz + acc.astype(bf), False).astype(jnp.float32)

    timed("velocity_field_l0 3->32->32->3 @l0 x8", t_vf, vf_vars, z)

    # 5) VecInt l0 (pallas stencil, in-bound) on (8, l0, 3) f32
    from pulpo_tpu.ops.warp import integrate_svf_auto, warp_image_auto

    df_small = jax.random.normal(k1, (ROWS, *l0_in, 3), jnp.float32) * 0.3

    @jax.jit
    def t_vecint(d, acc):
        return integrate_svf_auto(d + acc, nsteps=7)

    timed("vecint_l0 pallas @l0 x8", t_vecint, df_small)

    # 6) final-df resize l0 -> full res (f32, 3ch, 8 rows)
    @jax.jit
    def t_df_resize(d, acc):
        from pulpo_tpu.ops.warp import resize_vecfield

        return resize_vecfield(d + acc, 1.0 / (full[0] / l0_in[0]),
                               out_size=full)

    timed("df_resize_l0->full (8,*,3) f32", t_df_resize, df_small)

    # 7) cascade warp full-res (tier 1, in-bound), x image B=2, df 8 rows
    x_img = jax.random.uniform(jax.random.key(5), (B, *full, 1), jnp.float32)
    df_full = jax.random.normal(k1, (ROWS, *full, 3), jnp.float32) * 0.4

    @jax.jit
    def t_warp(m, d, acc):
        return warp_image_auto(m, d + acc)

    timed("warp_cascade_full x8 (tier1)", t_warp, x_img, df_full)

    # 8) whole decode chunk for reference
    from pulpo_tpu.models.pulpo import PULPoModule

    x = jax.random.uniform(jax.random.key(6), (B, *full, 1), jnp.float32)
    y = jax.random.uniform(jax.random.key(7), (B, *full, 1), jnp.float32)
    acts = model.module.apply(variables, x, y, train=False,
                              method=PULPoModule.encode)
    keys = jax.random.split(jax.random.key(8), S)

    @jax.jit
    def t_decode(v, xx, a, ks, acc):
        outs = model.module.apply(v, xx + acc.astype(xx.dtype), a, False,
                                  False, method=PULPoModule.decode,
                                  n_samples=S, sample_keys=ks)
        return outs[7][0].astype(jnp.float32)  # transformed l0

    timed("decode_chunk4_B2 (whole)", t_decode, variables, x, acts, keys)

    # 9) raw conv3d vs equivalent-FLOP matmul: is XLA's 3D conv mapping
    # onto the MXU, or is the conv itself the bottleneck?
    xc = jax.random.normal(k1, (ROWS, *l0_in, 96), bf)
    wc = jax.random.normal(k1, (3, 3, 3, 96, 96), bf)

    @jax.jit
    def t_conv(x, w, acc):
        return jax.lax.conv_general_dilated(
            x + acc.astype(bf), w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        ).astype(jnp.float32)

    dt_conv = timed("raw_conv3d 96->96 @l0 x8 (3.39 TFLOP)", t_conv, xc, wc)

    m_rows = ROWS * int(np.prod(l0_in))
    k_dim = 27 * 96
    a = jax.random.normal(k1, (m_rows, k_dim), bf)
    wm = jax.random.normal(k1, (k_dim, 96), bf)

    @jax.jit
    def t_mm(a_, w_, acc):
        return (a_ + acc.astype(bf)) @ w_

    dt_mm = timed("matmul same FLOPs (6.9M x 2592 x 96)", t_mm, a, wm)
    flops = 2 * m_rows * k_dim * 96
    print(f"conv3d {flops / dt_conv / 1e12:.1f} TFLOP/s, "
          f"matmul {flops / dt_mm / 1e12:.1f} TFLOP/s", flush=True)

    print("PROBE_DECODE_BREAKDOWN_DONE", flush=True)


if __name__ == "__main__":
    main()
