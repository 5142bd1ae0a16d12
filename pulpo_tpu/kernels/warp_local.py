"""Pallas TPU kernel: fused scaling-and-squaring step for local SVFs.

The VecInt inner loop (reference src/network_blocks.py:160-177) computes
``vec = vec + warp(vec, vec)`` — a trilinear *self*-gather. Mosaic
exposes no general per-element gather, but after the ``vec *= 1/2**7``
scaling the displacements are sub-voxel, so the sample point of every
output voxel lies within +-1 voxel of its own position: trilinear
interpolation degenerates to a **static 27-tap (3D) / 9-tap (2D)
halo stencil** whose per-tap weights are the hat functions
``max(0, 1 - |src - (g + o)|)``, o in {-1, 0, 1} per axis. Each grid
step DMAs one z-slab plus a 1-voxel halo from HBM into VMEM and writes
the fused ``vec + sample`` — no gather, no random HBM access.

Exactness condition (per axis, accounting for grid_sample's
align_corners=False mapping ``src = (g+v)*S/(S-1) - 0.5`` with border
clamp, ops/warp.py:_source_coords): |src - g| <= 1, guaranteed by
``max|v| <= 0.5*(S-1)/S`` (`local_bound`). `integrate_svf_pallas` guards
every squaring iteration with that bound at runtime (lax.cond), falling
back to the XLA gather path — results are bit-equal to the reference
semantics either way (tests/test_kernels.py).

Gradients: custom VJP whose backward re-derives the step through the
XLA composition (jax.vjp of the reference formulation) — the kernel is
a forward-path accelerator; training numerics are unchanged.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def local_bound(spatial: tuple[int, ...]) -> float:
    """max|v| (voxels) below which the 27-tap stencil is exact."""
    return min(0.5 * (s - 1) / s for s in spatial)


def _pick_slab(d: int, target: int = 4) -> int:
    # target=4 keeps the 27-tap stencil's live temporaries inside the
    # 16M VMEM scoped-stack limit at the level-0 shape (measured: bz=8
    # needs 23.3M)
    """Largest divisor of d that is <= target (static z-slab height)."""
    for c in range(min(d, target), 0, -1):
        if d % c == 0:
            return c
    return 1


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _step_accumulate(vbuf, z0, *, bz: int, spatial):
    """Fused ``vec + trilinear(vec, grid + vec)`` over one z-slab whose
    first output slice sits at global z ``z0``. `vbuf` is the DMA'd
    (3, bz+2, s1p, s2p) window with the slab interior at offset (1,1,1).
    Shared by the channels-last-facing and the chained channels-first
    kernels — identical math, one source of truth. Returns (3, bz, S1,
    S2) f32."""
    S0, S1, S2 = spatial

    center = vbuf[:, 1:bz + 1, 1:S1 + 1, 1:S2 + 1]  # (3, bz, S1, S2)

    # absolute source coordinates, align_corners=False + border clamp
    # (iota must be integer-typed for Mosaic; cast after)
    shape = (bz, S1, S2)
    gz = (jax.lax.broadcasted_iota(jnp.int32, shape, 0) + z0).astype(
        jnp.float32)
    gy = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32)
    gx = jax.lax.broadcasted_iota(jnp.int32, shape, 2).astype(jnp.float32)
    rel = []
    for a, g, s in ((0, gz, S0), (1, gy, S1), (2, gx, S2)):
        loc = g + center[a]
        src = jnp.clip(loc * (s / (s - 1.0)) - 0.5, 0.0, s - 1.0)
        rel.append(src - g)  # in [-1, 1] under local_bound

    # hat weights per axis per tap offset
    w = [[jnp.maximum(0.0, 1.0 - jnp.abs(r - o)) for o in (-1.0, 0.0, 1.0)]
         for r in rel]

    acc = [center[c] for c in range(3)]  # fused "+ vec"
    for oz in range(3):
        for oy in range(3):
            wzy = w[0][oz] * w[1][oy]
            for ox in range(3):
                weight = wzy * w[2][ox]
                tap = vbuf[:, oz:oz + bz, oy:oy + S1, ox:ox + S2]
                for c in range(3):
                    acc[c] = acc[c] + weight * tap[c]
    return jnp.stack(acc, axis=0)


def _step_kernel_3d(hbm_ref, out_ref, vbuf, sem, *, bz: int, spatial):
    """One (b, z-slab) grid step: out = vec + trilinear(vec, grid+vec).

    The input arrives padded so the DMA'd window has tile-aligned
    trailing dims (sublane multiple of 8, lane multiple of 128 — Mosaic
    rejects unaligned memref slices); the kernel reads only the live
    (S1+2, S2+2) halo region.
    """
    b = pl.program_id(0)
    zi = pl.program_id(1)

    dma = pltpu.make_async_copy(
        hbm_ref.at[b, :, pl.ds(zi * bz, bz + 2)], vbuf, sem)
    dma.start()
    dma.wait()

    out_ref[0] = _step_accumulate(vbuf, zi * bz, bz=bz, spatial=spatial)


def _step_kernel_2d(in_ref, out_ref, *, spatial):
    """2D fields are small: one whole (padded) field per grid step."""
    S0, S1 = spatial
    vbuf = in_ref[0]  # (2, S0p, S1p)
    center = vbuf[:, 1:S0 + 1, 1:S1 + 1]
    shape = (S0, S1)
    gz = jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(jnp.float32)
    gy = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32)
    rel = []
    for a, g, s in ((0, gz, S0), (1, gy, S1)):
        loc = g + center[a]
        src = jnp.clip(loc * (s / (s - 1.0)) - 0.5, 0.0, s - 1.0)
        rel.append(src - g)
    w = [[jnp.maximum(0.0, 1.0 - jnp.abs(r - o)) for o in (-1.0, 0.0, 1.0)]
         for r in rel]
    acc = [center[c] for c in range(2)]
    for oz in range(3):
        for oy in range(3):
            weight = w[0][oz] * w[1][oy]
            tap = vbuf[:, oz:oz + S0, oy:oy + S1]
            for c in range(2):
                acc[c] = acc[c] + weight * tap[c]
    out_ref[0] = jnp.stack(acc, axis=0)


def _squaring_step_pallas(vec: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """vec + warp(vec, vec) via the halo stencil. vec: (B, *spatial, nd),
    channels-last like ops/warp.py; exact iff max|vec| <= local_bound."""
    spatial = vec.shape[1:-1]
    ndims = len(spatial)
    assert ndims in (2, 3) and vec.shape[-1] == ndims
    b = vec.shape[0]
    orig_dtype = vec.dtype

    # channels-first for clean (sublane, lane) = (S-2, S-1) tiling
    perm = (0, ndims + 1) + tuple(range(1, ndims + 1))
    vcf = jnp.transpose(vec.astype(jnp.float32), perm)  # (B, nd, *spatial)

    # zero padding is exact: the clamped source coordinate gives the
    # out-of-volume taps a hat weight of exactly 0. The trailing two
    # dims additionally pad up to the f32 (8, 128) tile so DMA'd /
    # blocked windows are tile-aligned (Mosaic requirement).
    if ndims == 3:
        S0, S1, S2 = spatial
        s1p = _round_up(S1 + 2, 8)
        s2p = _round_up(S2 + 2, 128)
        vp = jnp.pad(vcf, ((0, 0), (0, 0), (1, 1),
                           (1, s1p - S1 - 1), (1, s2p - S2 - 1)))
        bz = _pick_slab(S0)
        kern = functools.partial(_step_kernel_3d, bz=bz, spatial=spatial)
        out = pl.pallas_call(
            kern,
            grid=(b, S0 // bz),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, ndims, bz, S1, S2),
                lambda bi, zi: (bi, 0, zi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((b, ndims, S0, S1, S2), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((ndims, bz + 2, s1p, s2p), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
            interpret=interpret,
        )(vp)
    else:
        S0, S1 = spatial
        s0p = _round_up(S0 + 2, 8)
        s1p = _round_up(S1 + 2, 128)
        vp = jnp.pad(vcf, ((0, 0), (0, 0),
                           (1, s0p - S0 - 1), (1, s1p - S1 - 1)))
        kern = functools.partial(_step_kernel_2d, spatial=spatial)
        out = pl.pallas_call(
            kern,
            grid=(b,),
            in_specs=[pl.BlockSpec(
                (1, ndims, s0p, s1p), lambda bi: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(
                (1, ndims, S0, S1), lambda bi: (bi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct((b, ndims, S0, S1), jnp.float32),
            interpret=interpret,
        )(vp)

    inv = (0,) + tuple(range(2, ndims + 2)) + (1,)
    return jnp.transpose(out, inv).astype(orig_dtype)


def _bwd_kernel_3d(v_hbm, g_hbm, out_ref, vbuf, gbuf, sem_v, sem_g, *,
                   bz: int, spatial):
    """Transpose of the 27-tap squaring step (one (b, z-slab) grid step).

    Forward: out_i = v_i + sum_o w_o(v_i) * v_{i+o}. The VJP w.r.t. v
    given cotangent gbar therefore has three parts:

      identity:   vbar_i += gbar_i
      data:       vbar_j += sum_o w_o(v_{j-o}) * gbar_{j-o}
                  (the gather's transpose scatter, re-expressed as the
                  SAME halo-stencil read pattern with reversed offsets —
                  no scatter instruction exists or is needed)
      coordinate: vbar_i^a += s'_a(i) * sum_o h'_a(r_a - o_a)
                  * prod_{b!=a} h_b(r_b - o_b) * <v_{i+o}, gbar_i>

    with h the hat function, h'(u) = -sign(u)*1_{|u|<1}, s'_a the
    clip-masked grid scale S_a/(S_a-1). Weights for the data term are
    evaluated at HALO positions (they belong to neighbouring output
    voxels), so r/h are computed over the extended (slab+1) region; at
    true volume borders the zero-padded gbar kills out-of-volume
    contributions exactly.
    """
    b = pl.program_id(0)
    zi = pl.program_id(1)
    S0, S1, S2 = spatial

    dma_v = pltpu.make_async_copy(
        v_hbm.at[b, :, pl.ds(zi * bz, bz + 2)], vbuf, sem_v)
    dma_g = pltpu.make_async_copy(
        g_hbm.at[b, :, pl.ds(zi * bz, bz + 2)], gbuf, sem_g)
    dma_v.start()
    dma_g.start()
    dma_v.wait()
    dma_g.wait()

    ez, ey, ex = bz + 2, S1 + 2, S2 + 2  # extended (haloed) region
    ve = vbuf[:, :, :ey, :ex]            # (3, ez, ey, ex)
    ge = gbuf[:, :, :ey, :ex]

    # source offsets r_a and clip masks over the EXTENDED region; global
    # coordinates of extended position p are p - 1 (+ slab offset in z)
    eshape = (ez, ey, ex)
    gz = (jax.lax.broadcasted_iota(jnp.int32, eshape, 0)
          + (zi * bz - 1)).astype(jnp.float32)
    gy = (jax.lax.broadcasted_iota(jnp.int32, eshape, 1) - 1).astype(
        jnp.float32)
    gx = (jax.lax.broadcasted_iota(jnp.int32, eshape, 2) - 1).astype(
        jnp.float32)
    r, dmask = [], []
    for a, g, s in ((0, gz, S0), (1, gy, S1), (2, gx, S2)):
        loc = g + ve[a]
        src_un = loc * (s / (s - 1.0)) - 0.5
        src = jnp.clip(src_un, 0.0, s - 1.0)
        r.append(src - g)
        dmask.append(((src_un > 0.0) & (src_un < s - 1.0)).astype(
            jnp.float32) * (s / (s - 1.0)))

    # per-axis hat values/derivatives at the three tap offsets
    h = [[jnp.maximum(0.0, 1.0 - jnp.abs(ra - o)) for o in (-1.0, 0.0, 1.0)]
         for ra in r]
    dh = [[-jnp.sign(ra - o) * (jnp.abs(ra - o) < 1.0).astype(jnp.float32)
           for o in (-1.0, 0.0, 1.0)] for ra in r]

    ctr = lambda arr: arr[1:bz + 1, 1:S1 + 1, 1:S2 + 1]
    g_ctr = [ge[c, 1:bz + 1, 1:S1 + 1, 1:S2 + 1] for c in range(3)]
    acc = [g_ctr[c] for c in range(3)]        # identity + data terms
    coord = [jnp.zeros_like(g_ctr[0]) for _ in range(3)]  # coordinate term

    for oz in range(3):
        for oy in range(3):
            for ox in range(3):
                # W_o * gbar over the extended region, then shifted by
                # +o into the slab interior (data term)
                w_e = h[0][oz] * h[1][oy] * h[2][ox]
                z0, y0, x0 = 2 - oz, 2 - oy, 2 - ox  # 1 - (o-1)
                sl = (slice(z0, z0 + bz), slice(y0, y0 + S1),
                      slice(x0, x0 + S2))
                for c in range(3):
                    acc[c] = acc[c] + (w_e * ge[c])[sl]
                # coordinate term pieces at interior positions
                vtap = [vbuf[c, oz:oz + bz, oy:oy + S1, ox:ox + S2]
                        for c in range(3)]
                p_o = (vtap[0] * g_ctr[0] + vtap[1] * g_ctr[1]
                       + vtap[2] * g_ctr[2])
                hz, hy, hx = ctr(h[0][oz]), ctr(h[1][oy]), ctr(h[2][ox])
                dz, dy, dx = ctr(dh[0][oz]), ctr(dh[1][oy]), ctr(dh[2][ox])
                coord[0] = coord[0] + dz * hy * hx * p_o
                coord[1] = coord[1] + hz * dy * hx * p_o
                coord[2] = coord[2] + hz * hy * dx * p_o

    # the clip-masked grid scale applies to the coordinate term only
    out_ref[0] = jnp.stack(
        [acc[a] + coord[a] * ctr(dmask[a]) for a in range(3)], axis=0)


def _squaring_step_xla(vec: jnp.ndarray) -> jnp.ndarray:
    from pulpo_tpu.ops.warp import warp_image

    return vec + warp_image(vec, vec)


def _squaring_step_bwd_pallas(vec: jnp.ndarray, g: jnp.ndarray,
                              interpret: bool = False) -> jnp.ndarray:
    """VJP of the (sub-voxel-exact) 27-tap squaring step, as a Pallas
    halo stencil — replaces the gather + transpose-SCATTER pair XLA
    emits for the backward, which dominates the training-time cost of
    VecInt. vec, g: (B, *spatial, 3) channels-last; returns vbar with
    the same layout. Exact iff max|vec| <= local_bound (same condition
    as the forward; callers guard)."""
    spatial = vec.shape[1:-1]
    assert len(spatial) == 3 and vec.shape[-1] == 3
    b = vec.shape[0]
    S0, S1, S2 = spatial

    perm = (0, 4, 1, 2, 3)

    def prep(x):
        xcf = jnp.transpose(x.astype(jnp.float32), perm)
        s1p = _round_up(S1 + 2, 8)
        s2p = _round_up(S2 + 2, 128)
        return jnp.pad(xcf, ((0, 0), (0, 0), (1, 1),
                             (1, s1p - S1 - 1), (1, s2p - S2 - 1))), s1p, s2p

    vp, s1p, s2p = prep(vec)
    gp, _, _ = prep(g)
    # the backward keeps ~24 extended-region temporaries live (r, masks,
    # per-axis hats and their derivatives) — use thinner slabs than the
    # forward to stay inside the 16M scoped-VMEM limit
    bz = _pick_slab(S0, target=2)
    kern = functools.partial(_bwd_kernel_3d, bz=bz, spatial=spatial)
    out = pl.pallas_call(
        kern,
        grid=(b, S0 // bz),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 3, bz, S1, S2), lambda bi, zi: (bi, 0, zi, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 3, S0, S1, S2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((3, bz + 2, s1p, s2p), jnp.float32),
            pltpu.VMEM((3, bz + 2, s1p, s2p), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(vp, gp)
    inv = (0, 2, 3, 4, 1)
    return jnp.transpose(out, inv).astype(vec.dtype)


# below this voxel count the per-slab grid/DMA overhead loses to the
# XLA gather (measured on v5e: 1.9x win at 20x24x28=13k, 11x loss at
# 10x12x14=1.7k; scripts/bench_warp_kernel.py)
MIN_PALLAS_VOXELS = 8000

def SQUARING_HALOS() -> tuple[int, ...]:
    """Halo tiers for past-sub-voxel squaring steps. H=5 (taps=12) OOMs
    Mosaic's 16M scoped-VMEM stack even at level-res shapes (measured
    27.3M at 80x96x112 bz=2 — the 144-tap unrolled (oy, ox) chain keeps
    far more live than the slab estimator assumes), so the hardware
    default stops at H=3; fields past ~2.3 voxels/axis per step use the
    sparse repair ladder, then the exact XLA gather."""
    from pulpo_tpu import routing

    spec = routing.get("PULPO_SQUARING_HALO")
    return tuple(int(h) for h in spec.split(",") if h)


def _squaring_step_tiered(vec: jnp.ndarray,
                          interpret: bool = False) -> jnp.ndarray:
    """One scaling-and-squaring step, tiered by displacement magnitude.

    The fused 27-tap stencil handles the sub-voxel regime (early steps:
    after the 1/2^7 scaling displacements start tiny). Late steps double
    the field past the sub-voxel bound — at init-state ~1.5 voxels and
    for trained models up to |df|/2 — which previously fell back to the
    full XLA gather (measured ~2.7 s/step at level-0 shapes, 2.1 s of a
    3.1 s UQ decode chunk, probe_decode_bisect). Those steps now route
    through the general halo-stencil cascade (kernels/warp_halo.py,
    H in SQUARING_HALOS + sparse exact repair + XLA fallback); every
    branch is exact, so results still bit-match the reference VecInt.
    """
    import math

    if math.prod(vec.shape[1:-1]) < MIN_PALLAS_VOXELS:
        return _squaring_step_xla(vec)
    bound = local_bound(vec.shape[1:-1])
    safe = jnp.max(jnp.abs(vec)) <= bound
    if (vec.shape[-1] != 3
            or any(s < 2 * max(SQUARING_HALOS()) + 2 for s in vec.shape[1:-1])):
        # 2D / thin volumes: sub-voxel stencil or the XLA gather, as before
        return jax.lax.cond(
            safe, functools.partial(_squaring_step_pallas, interpret=interpret),
            _squaring_step_xla, vec)
    from pulpo_tpu.kernels.warp_halo import warp_cascaded

    return jax.lax.cond(
        safe,
        functools.partial(_squaring_step_pallas, interpret=interpret),
        lambda v: v + warp_cascaded(v, v, halos=SQUARING_HALOS(),
                                    interpret=interpret),
        vec)


@jax.custom_vjp
def squaring_step(vec: jnp.ndarray) -> jnp.ndarray:
    """One guarded scaling-and-squaring step: fused Pallas stencil while
    the field is sub-voxel, halo-tier cascade past it (exact at every
    tier; see _squaring_step_tiered)."""
    import math

    if math.prod(vec.shape[1:-1]) < MIN_PALLAS_VOXELS:
        return _squaring_step_xla(vec)
    return _squaring_step_tiered(vec)


def _squaring_step_fwd(vec):
    return squaring_step(vec), vec


def _squaring_step_bwd(vec, g):
    """Backward: Pallas transpose stencil when the saved input satisfies
    the same sub-voxel bound the forward used (so fwd and bwd agree on
    which composition ran), XLA vjp otherwise."""
    import math

    from pulpo_tpu import routing

    # default-on since the round-3 hardware train-step drive passed
    # (full-res bench.py train mode: 0.2165 pairs/s vs 0.1648 with the
    # XLA vjp, finite losses; gradient goldens in tests/test_kernels.py).
    # Disable with PULPO_NO_PALLAS_BWD=1.
    use_pallas = (
        vec.shape[-1] == 3
        and math.prod(vec.shape[1:-1]) >= MIN_PALLAS_VOXELS
        and jax.default_backend() == "tpu"
        and not routing.get("PULPO_NO_PALLAS_WARP")
        and not routing.get("PULPO_NO_PALLAS_BWD")
    )
    if not use_pallas:
        _, vjp = jax.vjp(_squaring_step_xla, vec)
        return vjp(g)

    bound = local_bound(vec.shape[1:-1])
    safe = jnp.max(jnp.abs(vec)) <= bound

    def pallas_bwd(args):
        return _squaring_step_bwd_pallas(*args)

    def tiered_bwd(args):
        # past the sub-voxel bound: compose the backward from the halo
        # cascades (round-3 train bisect: the XLA gather+scatter vjp of
        # the late squaring steps was 1.92 s of a 4.65 s full-res train
        # step). d(v + warp(v, v))^T g = g (identity) + df-cotangent +
        # moving-cotangent, each tier-guarded with sparse repair and an
        # exact XLA fallback.
        v, gg = args
        from pulpo_tpu.kernels.warp_halo import (
            _dfgrad_cascaded,
            _mgrad_cascaded,
        )

        halos = SQUARING_HALOS()
        out = (gg.astype(jnp.float32)
               + _dfgrad_cascaded(v, v, gg, halos)
               + _mgrad_cascaded(v, v, gg, halos))
        return out.astype(gg.dtype)

    def xla_bwd(args):
        v, gg = args
        _, vjp = jax.vjp(_squaring_step_xla, v)
        return vjp(gg)[0]

    tiers_ok = all(
        s >= 2 * max(SQUARING_HALOS()) + 2 for s in vec.shape[1:-1])
    beyond = tiered_bwd if tiers_ok else xla_bwd
    return (jax.lax.cond(safe, pallas_bwd, beyond, (vec, g)),)


squaring_step.defvjp(_squaring_step_fwd, _squaring_step_bwd)


# ---------------------------------------------------------------------------
# Channels-first (CF) squaring chain — round 5, PERF.md lever 1.
#
# The channels-last-facing `squaring_step` pays a CL->CF transpose, a
# tile pad and a CF->CL transpose around EVERY Pallas call: at the
# flagship config that is ~3 full-field HBM copies x 7 steps x K levels
# per decode chunk (the "pallas custom-call staging" byte class of the
# round-3 HLO accounting). The CF chain keeps the field in the kernels'
# native layout BETWEEN steps instead:
#
#   layout A: (B, 3, S0+2, r8(S1+2), r128(S2+2)) f32, interior at
#   offset (1, 1, 1) per spatial axis.
#
# The kernel consumes and produces layout A directly (manual output
# DMA), so a chain of steps has NO XLA-side layout ops at all. Pad
# contents: the halo/tile pads only ever need to be FINITE, not zero —
# every out-of-volume tap position has a hat weight of exactly 0 (the
# border clamp pins |rel - o| >= 1 there), and 0 * finite == 0. The
# y/x pad region is zero-filled once per kernel launch; the two z pad
# planes are rewritten from whatever finite slab data the output buffer
# holds (see `_step_kernel_3d_cf`). Exactness: bit-identical to
# `squaring_step` (tests/test_cf.py).
# ---------------------------------------------------------------------------


def cf_layout(spatial: tuple[int, int, int]) -> tuple[int, int, int]:
    """Padded (zp, yp, xp) of layout A for an interior `spatial`."""
    S0, S1, S2 = spatial
    return S0 + 2, _round_up(S1 + 2, 8), _round_up(S2 + 2, 128)


def cf_pad(vec: jnp.ndarray) -> jnp.ndarray:
    """(B, S0, S1, S2, 3) channels-last -> layout A (zero pads)."""
    spatial = vec.shape[1:-1]
    S0, S1, S2 = spatial
    zp, yp, xp = cf_layout(spatial)
    vcf = jnp.transpose(vec.astype(jnp.float32), (0, 4, 1, 2, 3))
    return jnp.pad(vcf, ((0, 0), (0, 0), (1, zp - S0 - 1),
                         (1, yp - S1 - 1), (1, xp - S2 - 1)))


def cf_unpad(vp: jnp.ndarray, spatial: tuple[int, int, int],
             dtype=None) -> jnp.ndarray:
    """Layout A -> (B, S0, S1, S2, 3) channels-last."""
    S0, S1, S2 = spatial
    interior = vp[:, :, 1:S0 + 1, 1:S1 + 1, 1:S2 + 1]
    out = jnp.transpose(interior, (0, 2, 3, 4, 1))
    return out if dtype is None else out.astype(dtype)


def cf_interior(vp: jnp.ndarray, spatial: tuple[int, int, int]) -> jnp.ndarray:
    """Layout A -> unpadded channels-first (B, 3, S0, S1, S2) view."""
    S0, S1, S2 = spatial
    return vp[:, :, 1:S0 + 1, 1:S1 + 1, 1:S2 + 1]


def _step_kernel_3d_cf(hbm_ref, out_hbm, vbuf, obuf, sem_in, sem_out, *,
                       bz: int, spatial):
    """Layout-A-chained squaring step: one (b, z-slab) grid step reading
    AND writing layout A, so consecutive steps need no XLA layout ops.

    Output invariants: the y/x pad region of `obuf` is zero-filled once
    (first grid step) and never touched again — every interior slab DMA
    carries those zeros; the two z pad planes (global rows 0 and S0+1)
    are rewritten each launch from whatever finite plane `obuf` holds
    (zeros on the very first step, the previous row's slab after).
    Finite-garbage pads are exact: out-of-volume taps have hat weight
    exactly 0 (see the module comment above)."""
    b = pl.program_id(0)
    zi = pl.program_id(1)
    S0, S1, S2 = spatial

    dma = pltpu.make_async_copy(
        hbm_ref.at[b, :, pl.ds(zi * bz, bz + 2)], vbuf, sem_in)
    dma.start()
    dma.wait()

    @pl.when(jnp.logical_and(b == 0, zi == 0))
    def _init_pads():
        obuf[...] = jnp.zeros(obuf.shape, jnp.float32)

    @pl.when(zi == 0)
    def _z_pad_planes():
        dma_lo = pltpu.make_async_copy(
            obuf.at[:, 0:1], out_hbm.at[b, :, 0:1], sem_out)
        dma_lo.start()
        dma_lo.wait()
        dma_hi = pltpu.make_async_copy(
            obuf.at[:, 0:1], out_hbm.at[b, :, S0 + 1:S0 + 2], sem_out)
        dma_hi.start()
        dma_hi.wait()

    obuf[:, :, 1:S1 + 1, 1:S2 + 1] = _step_accumulate(
        vbuf, zi * bz, bz=bz, spatial=spatial)
    dma_o = pltpu.make_async_copy(
        obuf, out_hbm.at[b, :, pl.ds(zi * bz + 1, bz)], sem_out)
    dma_o.start()
    dma_o.wait()


def _cf_compiler_params():
    """Optional scoped-VMEM lift for the CF kernels (PULPO_CF_VMEM_MB;
    0 = the compiler's 16M default, matching the CL twins — see the
    warp_halo note)."""
    from pulpo_tpu import routing

    mb = int(routing.get("PULPO_CF_VMEM_MB") or "0")
    if mb:
        return pltpu.CompilerParams(vmem_limit_bytes=mb * 1024 * 1024)
    return None


def _squaring_step_cf_pallas(vp: jnp.ndarray, spatial: tuple[int, int, int],
                             interpret: bool = False) -> jnp.ndarray:
    """Layout A -> layout A squaring step (sub-voxel regime)."""
    S0, S1, S2 = spatial
    b = vp.shape[0]
    zp, yp, xp = vp.shape[2:]
    assert (zp, yp, xp) == cf_layout(spatial), (vp.shape, spatial)
    bz = _pick_slab(S0)
    kern = functools.partial(_step_kernel_3d_cf, bz=bz, spatial=spatial)
    return pl.pallas_call(
        kern,
        grid=(b, S0 // bz),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(vp.shape, jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((3, bz + 2, yp, xp), jnp.float32),
            pltpu.VMEM((3, bz, yp, xp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=_cf_compiler_params(),
        interpret=interpret,
    )(vp)


def _squaring_step_cf(vp: jnp.ndarray, spatial: tuple[int, int, int],
                      interpret: bool = False) -> jnp.ndarray:
    """Guarded layout-A squaring step: the chained CF stencil while the
    field is sub-voxel; past the bound, the CF-native halo-tier cascade
    (kernels/warp_halo.warp_cascaded_cf — df rides layout A straight
    into the tier kernels, the moving operand is re-padded CF->CF with
    a single lax.pad, no transposes anywhere)."""
    bound = local_bound(spatial)
    safe = jnp.max(jnp.abs(cf_interior(vp, spatial))) <= bound

    def beyond(v):
        from pulpo_tpu.kernels.warp_halo import squaring_beyond_cf

        return squaring_beyond_cf(v, spatial, SQUARING_HALOS(), interpret)

    return jax.lax.cond(
        safe,
        functools.partial(_squaring_step_cf_pallas, spatial=spatial,
                          interpret=interpret),
        beyond, vp)


def integrate_cf_padded(vp: jnp.ndarray, spatial: tuple[int, int, int],
                        nsteps: int = 7,
                        interpret: bool = False) -> jnp.ndarray:
    """Scaling & squaring on layout A (input NOT yet 1/2^n scaled).
    Callers that start channels-last use `integrate_svf_cf`."""
    assert nsteps >= 0
    vp = vp * (1.0 / (2 ** nsteps))
    for _ in range(nsteps):
        vp = _squaring_step_cf(vp, spatial, interpret)
    return vp


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def integrate_svf_cf(vec: jnp.ndarray, nsteps: int = 7,
                     interpret: bool = False) -> jnp.ndarray:
    """integrate_svf through the chained CF layout: ONE transpose+pad
    in, ONE transpose out, zero XLA layout ops between the `nsteps`
    Pallas calls. Bit-matches `integrate_svf_pallas` / `integrate_svf`
    (every branch of every step is the same math; tests/test_cf.py).

    Gradient: inference accelerator — the (unexpected) backward replays
    through the channels-last chain's custom VJPs. Hot training paths
    route the CL chain directly (ops/warp.integrate_svf_auto)."""
    spatial = vec.shape[1:-1]
    vp = cf_pad(vec)
    vp = integrate_cf_padded(vp, spatial, nsteps, interpret)
    return cf_unpad(vp, spatial, dtype=vec.dtype)


def _integrate_svf_cf_fwd(vec, nsteps, interpret):
    return integrate_svf_cf(vec, nsteps, interpret), vec


def _integrate_svf_cf_bwd(nsteps, interpret, vec, g):
    _, vjp = jax.vjp(lambda v: integrate_svf_pallas(v, nsteps), vec)
    return (vjp(g)[0],)


integrate_svf_cf.defvjp(_integrate_svf_cf_fwd, _integrate_svf_cf_bwd)


def cf_chain_applicable(spatial: tuple[int, ...]) -> bool:
    """Static eligibility of the CF squaring chain: 3D, big enough for
    the stencils, roomy enough for the cascade tiers."""
    import math as _math

    return (
        len(spatial) == 3
        and _math.prod(spatial) >= MIN_PALLAS_VOXELS
        and all(s >= 2 * max(SQUARING_HALOS()) + 2 for s in spatial)
    )


def integrate_svf_pallas(vec: jnp.ndarray, nsteps: int = 7) -> jnp.ndarray:
    """Scaling & squaring with the guarded Pallas stencil per iteration.

    Matches ops/warp.py:integrate_svf exactly (VecInt,
    network_blocks.py:160-177); each of the `nsteps` self-warps runs the
    27-tap VMEM kernel while displacements stay sub-voxel and falls back
    to the XLA gather once squaring grows them past the bound.

    Note: under jax.vmap, lax.cond lowers to a select that evaluates
    both branches — prefer the XLA path (use_pallas=False) inside
    vmapped sample loops; this entry point targets the non-batched
    deterministic / mean-SVF paths.
    """
    assert nsteps >= 0
    vec = vec * (1.0 / (2 ** nsteps))
    for _ in range(nsteps):
        vec = squaring_step(vec)
    return vec
