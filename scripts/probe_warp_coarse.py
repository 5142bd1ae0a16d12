"""Probe: coarse-offset large-displacement warp tier vs the XLA gather
(v5e). The BASELINE config-3 LungCT inspiration/expiration regime has
displacements of tens of voxels — beyond the plain tiers' +-2.3-voxel
bound. The coarse tier (kernels/warp_halo.py round 4) subtracts
per-slab integer z offsets (dynamic DMA starts) and per-row y/x
offsets (XLA-side shifted operand) so the static taps only cover the
residual.

Measures at the LungCT shape (144, 192, 160), c=1, 8 df rows / 2
moving rows, on three field families:
  - pure large z shift (~12 voxels) + sub-voxel noise (the coarse
    tier's dense branch),
  - smooth respiratory-like field (z-dominant, 10-16 voxel SI
    amplitude varying along z, 3-5 voxel in-plane) — dense or small
    repair,
  - isotropic large random (hostile: falls through to gather).
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_warp_coarse.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from pulpo_tpu.kernels.warp_halo import (
    _halo_bz,
    _round_up,
    coarse_bad_mask,
    coarse_offsets,
    warp_coarse_tier,
)
from pulpo_tpu.ops.warp import warp_image

S = (144, 192, 160)
B, BDF = 2, 8
H = 3


def fields():
    rng = np.random.default_rng(0)
    mov = jnp.asarray(rng.standard_normal((B, *S, 1)).astype(np.float32))
    # 1) pure z shift + sub-voxel noise
    dz = np.zeros((BDF, *S, 3), np.float32)
    dz[..., 0] = 12.0
    dz += rng.uniform(-0.4, 0.4, dz.shape).astype(np.float32)
    # 2) respiratory-like: SI displacement grows toward the diaphragm
    #    (linear in z, 0 -> 16 voxels), small smooth in-plane components
    zz = np.linspace(0.0, 1.0, S[0], dtype=np.float32)[:, None, None]
    yy = np.linspace(0.0, 2 * np.pi, S[1], dtype=np.float32)[None, :, None]
    xx = np.linspace(0.0, 2 * np.pi, S[2], dtype=np.float32)[None, None, :]
    resp = np.zeros((BDF, *S, 3), np.float32)
    resp[..., 0] = 16.0 * zz ** 1.5
    resp[..., 1] = 3.0 * np.sin(yy) * zz
    resp[..., 2] = 2.5 * np.cos(xx) * zz
    resp += rng.uniform(-0.3, 0.3, resp.shape).astype(np.float32)
    # 3) hostile isotropic large random
    iso = rng.uniform(-10, 10, (BDF, *S, 3)).astype(np.float32)
    return mov, jnp.asarray(dz), jnp.asarray(resp), jnp.asarray(iso)


def timed(name, fn, *args, iters=3):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    float(jax.device_get(f(*args).sum()))
    print(f"{name}: compile+1 {time.perf_counter() - t0:.2f}s", flush=True)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(jax.device_get(f(*args).sum()))
        ts.append(time.perf_counter() - t0)
    print(f"{name}: warm {min(ts):.3f}s  (all: "
          + " ".join(f"{t:.3f}" for t in ts) + ")", flush=True)
    return min(ts)


def main():
    mov, dz, resp, iso = fields()
    taps = 2 * H + 2
    s1p = _round_up(S[1] + taps - 1, 8)
    s2p = _round_up(S[2] + taps - 1, 128)
    bz = _halo_bz(S[0], S[1], S[2], taps, 1, s1p, s2p,
                  _round_up(S[1], 8), _round_up(S[2], 128))
    for name, df in (("zshift12", dz), ("respiratory", resp),
                     ("isotropic10", iso)):
        cz, cyx = coarse_offsets(df, B, bz)
        bad = coarse_bad_mask(df, H, cz, cyx, B, bz)
        print(f"{name}: bad frac {float(bad.mean()):.4f} "
              f"cz [{int(cz.min())},{int(cz.max())}]", flush=True)
        # exactness on-chip
        got = jax.jit(lambda m, d: warp_coarse_tier(m, d, H))(mov, df)
        ref = jax.jit(warp_image)(mov, df)
        err = float(jnp.abs(got - ref).max())
        print(f"{name}: maxdiff vs gather {err:.2e}", flush=True)
        t_c = timed(f"coarse_{name}", lambda m, d: warp_coarse_tier(m, d, H),
                    mov, df)
        t_g = timed(f"gather_{name}", warp_image, mov, df)
        print(f"{name}: speedup {t_g / t_c:.1f}x", flush=True)


if __name__ == "__main__":
    main()
