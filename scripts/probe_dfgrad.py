"""dfgrad mismatch round 2: determinism + seed sweep + hand-check of a
bad voxel. (bz sweep at (32,48,224) b1 mag1.0 seed0 was CLEAN at
bz 1/2/4 while the first probe's different-data run failed at auto
bz=4 -> data-dependent or nondeterministic.)"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

from pulpo_tpu.kernels.warp_halo import _warp_halo_dfgrad_pallas
from pulpo_tpu.ops.warp import warp_image

S = (32, 48, 224)
HALO = 2


@jax.jit
def ref_fn(m, d, gg):
    _, vjp = jax.vjp(warp_image, m, d)
    return vjp(gg)[1]


@jax.jit
def got_fn(m, d, gg):
    return _warp_halo_dfgrad_pallas(m, d, gg, HALO)


def hand_dfgrad(mnp, dnp, gnp, v):
    """numpy trilinear df-cotangent at voxel v=(z,y,x) of batch row 0."""
    out = np.zeros(3)
    zyx = np.array(v, dtype=np.float64)
    rel, dsc = [], []
    for a, s in enumerate(S):
        scale = s / (s - 1.0)
        srcu = (zyx[a] + dnp[0, v[0], v[1], v[2], a]) * scale - 0.5
        src = min(max(srcu, 0.0), s - 1.0)
        rel.append(src - zyx[a])
        dsc.append(scale if 0.0 < srcu < s - 1.0 else 0.0)

    def hat(r, o):
        return max(0.0, 1.0 - abs(r - o))

    def dhat(r, o):
        return -np.sign(r - o) if abs(r - o) < 1.0 else 0.0

    for oz in range(-HALO, HALO + 2):
        for oy in range(-HALO, HALO + 2):
            for ox in range(-HALO, HALO + 2):
                p = (v[0] + oz, v[1] + oy, v[2] + ox)
                if not all(0 <= p[a] < S[a] for a in range(3)):
                    continue
                m = mnp[0, p[0], p[1], p[2], 0]
                gm = gnp[0, v[0], v[1], v[2], 0] * m
                w = [hat(rel[0], oz), hat(rel[1], oy), hat(rel[2], ox)]
                dw = [dhat(rel[0], oz), dhat(rel[1], oy), dhat(rel[2], ox)]
                out[0] += gm * dw[0] * w[1] * w[2]
                out[1] += gm * w[0] * dw[1] * w[2]
                out[2] += gm * w[0] * w[1] * dw[2]
    return out * np.array(dsc)


for seed in range(6):
    rng = np.random.default_rng(100 + seed)
    mov = jnp.asarray(rng.standard_normal((1, *S, 1)).astype(np.float32))
    df = jnp.asarray(rng.uniform(-1.0, 1.0, (1, *S, 3)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((1, *S, 1)).astype(np.float32))
    ref = jax.device_get(ref_fn(mov, df, g))
    got1 = jax.device_get(got_fn(mov, df, g))
    got2 = jax.device_get(got_fn(mov, df, g))
    det = float(np.abs(got1 - got2).max())
    dif = np.abs(got1 - ref)
    n_bad = int((dif > 1e-3).sum())
    print(f"seed {100 + seed}: maxdiff {dif.max():.3e} n_bad {n_bad} "
          f"det(got1-got2) {det:.3e}", flush=True)
    if n_bad and seed < 3:
        idx = np.unravel_index(int(dif.argmax()), dif.shape)
        v = idx[1:4]
        mnp, dnp, gnp = (np.asarray(t) for t in (mov, df, g))
        hand = hand_dfgrad(mnp, dnp, gnp, v)
        print(f"  bad voxel {idx}: ref {ref[0, v[0], v[1], v[2]]}, "
              f"got {got1[0, v[0], v[1], v[2]]}, hand {hand}", flush=True)
        print(f"  df there {dnp[0, v[0], v[1], v[2]]}", flush=True)

print("PROBE_DFGRAD_DONE", flush=True)
