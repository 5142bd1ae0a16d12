"""Pallas TPU kernel: displacement-bounded dense warp (general images).

`ops/warp.py:warp_image` lowers to per-voxel XLA gathers, which execute
on the TPU scalar core at a per-row cost (~100M rows/s measured round
3) — the per-sample full-res `transformed = warp(x, final_df)` of the
UQ decode (reference src/models.py:330, pulpo.py:146) alone costs
seconds per call. Mosaic exposes no general per-element gather, but
registration dfs are smooth and bounded: when every source coordinate
lies within +-H voxels of its own position, trilinear interpolation is
a static (2H+2)^3-tap halo stencil (the same degeneration
kernels/warp_local.py uses at H=1 for sub-voxel SVF squaring steps,
generalized to configurable H and to warping an arbitrary C-channel
image by a separate df). Each grid step DMAs one z-slab of `moving`
plus an H-voxel halo into VMEM and accumulates hat-weighted taps —
vector ops only, no random HBM access.

Exactness condition: per axis, |clip(src) - g| <= H where
src = (g + v) * S/(S-1) - 0.5 (grid_sample align_corners=False +
border clamp, ops/warp.py:_source_coords). `warp_image_auto` checks it
at runtime (lax.cond) and falls back to the XLA gather — results match
the reference semantics either way (tests/test_kernels.py).

Sample-tiled batching: df may carry posterior samples folded into its
batch axis (b_df = S * B, models/pulpo.py n_samples); each df row b'
reads moving row b' % B — the moving volume is never tiled S-fold.

Gradients: custom VJP re-derives the warp through the XLA composition
(the kernel is a forward/inference accelerator; training numerics are
unchanged).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pulpo_tpu.kernels.warp_local import _pick_slab, _round_up


def _routing_get(name: str) -> str:
    from pulpo_tpu import routing

    return routing.get(name)

# largest tap count whose (oy, ox) chain is fully unrolled in-kernel.
# Bigger tap counts would need a dynamic-start sublane slice per oy,
# which real Mosaic rejects — those tiers exist for interpret mode only.
UNROLL_TAPS_MAX = 12

# above this tap count, per-axis hat weights are recomputed inline per
# (oy, ox) instead of precomputed as 2*taps live VMEM arrays (the lists
# dominate Mosaic's scoped-stack high-water mark for long chains).
# SINGLE-channel warps (c=1: the image warps) inline at every tap count
# regardless: measured FASTER at full-res 8 rows (H=2 fwd 0.059 s vs
# 0.065, H=3 0.095 vs 0.099 — fewer live VMEM temporaries beat the
# taps^2 recompute) and hardware-validated. MULTI-channel warps (c=3:
# the tiered squaring steps) must NOT inline below this threshold:
# Mosaic's stack for the c=3/taps=8 inline chain measured 27.57M at
# l1 shapes (> the 16M limit, breaks the UQ compile). Forcing bigger
# z-slabs (PULPO_WARP_BZ=2 at full res) crashes the relay's compile
# helper outright — slabs stay auto-sized.
def INLINE_W_TAPS() -> int:
    from pulpo_tpu import routing

    return int(routing.get("PULPO_WARP_INLINE_W"))


def _halo_tap_accumulate(mbuf, dbuf, z0, *, bz: int, halo: int, spatial,
                         c: int, coarse=None, moy: int = 0, mox: int = 0,
                         doff: int = 0):
    """Accumulate the (2H+2)^3 hat-weighted taps of one z-slab whose
    first output slice sits at (dynamic) global z `z0`. Shared by the
    per-slab-grid kernel and the internal-z-loop kernel — identical
    math, one source of truth. Returns a c-tuple of (bz, S1, S2) f32
    accumulators.

    `coarse`: optional (cz, cy, cx) traced int32 scalars — the
    large-displacement tier's per-slab/per-row integer offsets. The
    moving window the caller DMA'd is already positioned at +coarse, so
    the stencil sees the RESIDUAL offset rel - coarse; the tap geometry
    is unchanged (kernels/warp_halo.py coarse tier, round 4).

    `moy`/`mox`: static y/x offsets of the moving interior within
    `mbuf` beyond the usual halo position (0 for the channels-last
    wrappers, which pad the interior to exactly (H, H); the CF pipeline
    passes moff - halo when the operand carries a larger interior
    offset). `doff`: static y/x offset of the df interior within
    `dbuf` (1 for layout-A CF fields, else 0)."""
    S0, S1, S2 = spatial
    taps = 2 * halo + 2

    shape = (bz, S1, S2)
    gz = (jax.lax.broadcasted_iota(jnp.int32, shape, 0) + z0).astype(
        jnp.float32)
    gy = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32)
    gx = jax.lax.broadcasted_iota(jnp.int32, shape, 2).astype(jnp.float32)
    rel = []
    for a, g, s in ((0, gz, S0), (1, gy, S1), (2, gx, S2)):
        loc = g + dbuf[a, :, doff:doff + S1, doff:doff + S2]
        src = jnp.clip(loc * (s / (s - 1.0)) - 0.5, 0.0, s - 1.0)
        r = src - g  # in [-H, H+1] under the caller's guard
        if coarse is not None:
            r = r - coarse[a].astype(jnp.float32)
        rel.append(r)

    def hat(r, o):
        return jnp.maximum(0.0, 1.0 - jnp.abs(r - o))

    # x/y-axis weights are reused taps^2 times each -> precompute for
    # small tap counts; the z taps run in a fori_loop so each
    # iteration's temporaries are scoped (a fully unrolled taps^3 chain
    # overflows Mosaic's 16M scoped-VMEM stack: measured 18-26M at
    # taps=6 full-res). For taps > INLINE_W_TAPS the wy/wx lists
    # themselves dominate the live set (Mosaic's stack high-water runs
    # ~4-5x the analytic estimate for long unrolled chains) — recompute
    # the weights inline per (oy, ox) instead: ~2 live temporaries at
    # taps^2 extra cheap VPU ops. Beyond UNROLL_TAPS_MAX the oy taps
    # would need a fori_loop, which real Mosaic rejects for dynamic
    # sublane-dim slice starts ("cannot statically prove index is a
    # multiple of 8") — that path is interpret-only; hardware tiers are
    # capped at UNROLL_TAPS_MAX (see halo_cascade).
    inline_w = taps > INLINE_W_TAPS() or c == 1
    wx = None if inline_w else [hat(rel[2], float(ox - halo))
                                for ox in range(taps)]
    wy = ([hat(rel[1], float(oy - halo)) for oy in range(taps)]
          if not inline_w and taps <= UNROLL_TAPS_MAX else None)

    def z_tap(oz, acc):
        wz = hat(rel[0], (oz - halo).astype(jnp.float32))
        if inline_w and taps <= UNROLL_TAPS_MAX:
            for oy in range(taps):
                wzy = wz * hat(rel[1], float(oy - halo))
                for ox in range(taps):
                    w = wzy * hat(rel[2], float(ox - halo))
                    acc = tuple(
                        acc[ch] + w * mbuf[ch, pl.ds(oz, bz),
                                           moy + oy:moy + oy + S1,
                                           mox + ox:mox + ox + S2]
                        for ch in range(c))
            return acc
        if wy is not None:
            for oy in range(taps):
                wzy = wz * wy[oy]
                for ox in range(taps):
                    w = wzy * wx[ox]
                    acc = tuple(
                        acc[ch] + w * mbuf[ch, pl.ds(oz, bz),
                                           moy + oy:moy + oy + S1,
                                           mox + ox:mox + ox + S2]
                        for ch in range(c))
            return acc

        def y_tap(oy, acc_y):
            wzy = wz * hat(rel[1], (oy - halo).astype(jnp.float32))
            for ox in range(taps):
                w = wzy * wx[ox]
                acc_y = tuple(
                    acc_y[ch] + w * mbuf[ch, pl.ds(oz, bz),
                                         pl.ds(moy + oy, S1),
                                         mox + ox:mox + ox + S2]
                    for ch in range(c))
            return acc_y

        return jax.lax.fori_loop(0, taps, y_tap, acc)

    return jax.lax.fori_loop(
        0, taps, z_tap,
        tuple(jnp.zeros(shape, jnp.float32) for _ in range(c)))


def _warp_halo_kernel(mov_hbm, df_hbm, out_ref, mbuf, dbuf, sem_m, sem_d, *,
                      bz: int, halo: int, spatial, c: int, b_mov: int,
                      moff: int | None = None, doff: int = 0):
    """One (b_df, z-slab) grid step: out = trilinear(moving, grid + df).

    mov_hbm: (B, C, S0 + 2H + 1, s1p, s2p) zero-padded, tile-aligned
    trailing dims; position of source voxel s is s + H per axis.
    df_hbm: (B_df, 3, S0, s1p_d, s2p_d). Taps o in {-H, ..., H+1}; the
    hat weight max(0, 1 - |rel - o|) is nonzero for exactly the two
    integer corners of each voxel, so zero padding is exact (clamped
    coordinates keep all nonzero-weight taps inside the volume).

    CF-pipeline generalization (round 5): `moff`/`doff` are the static
    per-axis interior offsets of the moving / df arrays when the caller
    hands over already-channels-first operands whose interior does not
    sit at exactly (H,H,H) / (0,0,0) — e.g. the layout-A squaring
    fields (doff=1). Defaults reproduce the original addressing
    bit-for-bit (moff=halo, doff=0)."""
    b = pl.program_id(0)
    zi = pl.program_id(1)
    taps = 2 * halo + 2
    if moff is None:
        moff = halo

    dma_m = pltpu.make_async_copy(
        mov_hbm.at[jax.lax.rem(b, b_mov), :,
                   pl.ds(zi * bz + moff - halo, bz + taps - 1)],
        mbuf, sem_m)
    dma_d = pltpu.make_async_copy(
        df_hbm.at[b, :, pl.ds(zi * bz + doff, bz)], dbuf, sem_d)
    dma_m.start()
    dma_d.start()
    dma_m.wait()
    dma_d.wait()

    acc = _halo_tap_accumulate(mbuf, dbuf, zi * bz, bz=bz, halo=halo,
                               spatial=spatial, c=c, moy=moff - halo,
                               mox=moff - halo, doff=doff)
    out_ref[0] = jnp.stack(list(acc), axis=0)


def _warp_halo_zloop_kernel(mov_hbm, df_hbm, out_hbm, mbuf, dbuf, obuf,
                            sem_m, sem_d, sem_o, *, bz: int, halo: int,
                            spatial, c: int, b_mov: int, nz: int):
    """One grid step per df ROW; the z-slab walk runs as an internal
    fori_loop with manual DMAs (same slab sizes, same tap math as
    `_warp_halo_kernel`).

    Motivation (PERF.md round 3): at full res the VMEM budget forces
    bz=1, so the per-slab-grid kernel runs S0 grid steps per row
    (1280/call at the flagship shape) and roughly half its runtime is
    per-grid-step fixed overhead (H=1-vs-H=2 neutral, DMA pipelining
    neutral — not taps, not DMA waits). Folding the z walk into the
    kernel body amortizes that overhead S0/bz-fold without growing the
    live set: the loop body is exactly the old grid step.

    The output leaves through a staged per-slab DMA (out_hbm in ANY
    memory, tile-aligned trailing pads sliced off by the caller).
    """
    b = pl.program_id(0)
    S0, S1, S2 = spatial
    taps = 2 * halo + 2

    def body(zi, carry):
        dma_m = pltpu.make_async_copy(
            mov_hbm.at[jax.lax.rem(b, b_mov),
                       :, pl.ds(zi * bz, bz + taps - 1)],
            mbuf, sem_m)
        dma_d = pltpu.make_async_copy(
            df_hbm.at[b, :, pl.ds(zi * bz, bz)], dbuf, sem_d)
        dma_m.start()
        dma_d.start()
        dma_m.wait()
        dma_d.wait()
        acc = _halo_tap_accumulate(mbuf, dbuf, zi * bz, bz=bz, halo=halo,
                                   spatial=spatial, c=c)
        obuf[:, :, :S1, :S2] = jnp.stack(list(acc), axis=0)
        dma_o = pltpu.make_async_copy(
            obuf, out_hbm.at[b, :, pl.ds(zi * bz, bz)], sem_o)
        dma_o.start()
        dma_o.wait()
        return carry

    jax.lax.fori_loop(0, nz, body, jnp.int32(0))


def use_zloop() -> bool:
    """Internal-z-loop kernel structure (grid over rows, z walked
    in-kernel). OPT-IN via PULPO_WARP_ZLOOP=1 until the composed
    flagship A/B lands (round-3 rule: no default flips without a
    full-bench win)."""
    from pulpo_tpu import routing

    return routing.get("PULPO_WARP_ZLOOP") == "1"


def _halo_bz(S0: int, S1: int, S2: int, taps: int, c: int,
             s1p: int, s2p: int, s1d: int, s2d: int) -> int:
    """Z-slab height for the halo kernels (factored so the coarse tier
    replicates the exact choice its per-slab offsets are computed at).
    VMEM budget: moving slab (C, bz+2H+1, s1p, s2p) + df slab + the
    per-iteration working set (wx/wy tap lists, rel, accumulators — all
    (bz, S1, S2)). Mosaic's true scoped-stack high-water mark runs
    ~4-5x this estimate for the unrolled tap chains (measured round 3:
    est 6.8M -> actual 31.5M at taps=8, 80x96x112, bz=4), so the budget
    is 3M of the 16M limit — level-res shapes land on bz=1-2, full-res
    was already there. PULPO_WARP_BZ overrides for tuning."""
    from pulpo_tpu import routing

    env_bz = routing.get("PULPO_WARP_BZ")
    if env_bz:
        target = int(env_bz)
    else:
        # budget with the PRECOMPUTED path's live set even when c==1
        # inlines: same (validated) bz choice, strictly less VMEM
        n_w = 4 if taps > INLINE_W_TAPS() else 2 * taps
        # target capped at 4: the byte estimate under-predicts Mosaic's
        # real stack by ~4-5x at flagship planes but by >10x at SMALL
        # planes — bz=8 at (24,32,32) taps=8 measured 20.33M > 16M on
        # hardware (round-5 drive). Flagship shapes choose bz<=2 either
        # way, so their programs/cache keys are unchanged.
        target = 4
        while target > 1:
            est = 4 * (c * (target + taps - 1) * s1p * s2p        # mbuf
                       + 3 * target * s1d * s2d                   # dbuf
                       + (n_w + 4 + 2 * c) * target * S1 * S2)
            if est <= 3 * 2**20:
                break
            target //= 2
    return _pick_slab(S0, target=target)


def _halo_compiler_params(taps: int):
    """Scoped-VMEM lift for the big-tap tiers (H >= 4): Mosaic\'s 16M
    scoped-stack default rejected taps >= 10 in round 3 (41.5M measured
    at taps 18); the limit is a compiler default, not physical. Applied
    ONLY above taps 8 — or when PULPO_WARP_BZ forces bigger slabs (the
    round-5 bz re-probe, VERDICT r4 #6) — so the flagship H<=3
    programs (and their compile cache keys) stay byte-identical."""
    if taps <= 8 and not _routing_get("PULPO_WARP_BZ"):
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)



def _warp_halo_pallas(moving: jnp.ndarray, df: jnp.ndarray, halo: int,
                      interpret: bool = False) -> jnp.ndarray:
    """Raw kernel wrapper: moving (B, *spatial, C), df (B_df, *spatial, 3)
    with B_df a multiple of B, SAME spatial shape. Exact iff the halo
    bound holds (callers guard via `halo_bound_ok`)."""
    spatial = moving.shape[1:-1]
    assert len(spatial) == 3 and df.shape[-1] == 3
    assert df.shape[1:-1] == spatial, (moving.shape, df.shape)
    b = moving.shape[0]
    b_df = df.shape[0]
    assert b_df % b == 0
    c = moving.shape[-1]
    S0, S1, S2 = spatial
    orig_dtype = moving.dtype
    taps = 2 * halo + 2

    mcf = jnp.transpose(moving.astype(jnp.float32), (0, 4, 1, 2, 3))
    dcf = jnp.transpose(df.astype(jnp.float32), (0, 4, 1, 2, 3))

    # moving: halo padding (H low, H+1 high) + trailing-dim tile
    # alignment (sublane mult 8, lane mult 128 — Mosaic DMA requirement)
    s1p = _round_up(S1 + taps - 1, 8)
    s2p = _round_up(S2 + taps - 1, 128)
    mp = jnp.pad(mcf, ((0, 0), (0, 0), (halo, halo + 1),
                       (halo, s1p - S1 - halo), (halo, s2p - S2 - halo)))
    # df: no halo, tile-aligned trailing dims
    s1d = _round_up(S1, 8)
    s2d = _round_up(S2, 128)
    dp = jnp.pad(dcf, ((0, 0), (0, 0), (0, 0),
                       (0, s1d - S1), (0, s2d - S2)))

    bz = _halo_bz(S0, S1, S2, taps, c, s1p, s2p, s1d, s2d)

    if use_zloop():
        # tile-aligned output pads (DMA'd whole, sliced off below);
        # interior rows/lanes beyond (S1, S2) carry garbage by design
        s1o = _round_up(S1, 8)
        s2o = _round_up(S2, 128)
        kern = functools.partial(_warp_halo_zloop_kernel, bz=bz, halo=halo,
                                 spatial=spatial, c=c, b_mov=b,
                                 nz=S0 // bz)
        out = pl.pallas_call(
            kern,
            grid=(b_df,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((b_df, c, S0, s1o, s2o),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((c, bz + taps - 1, s1p, s2p), jnp.float32),
                pltpu.VMEM((3, bz, s1d, s2d), jnp.float32),
                pltpu.VMEM((c, bz, s1o, s2o), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=_halo_compiler_params(taps),
            interpret=interpret,
        )(mp, dp)
        return jnp.transpose(out[..., :S1, :S2],
                             (0, 2, 3, 4, 1)).astype(orig_dtype)

    kern = functools.partial(_warp_halo_kernel, bz=bz, halo=halo,
                             spatial=spatial, c=c, b_mov=b)
    out = pl.pallas_call(
        kern,
        grid=(b_df, S0 // bz),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, c, bz, S1, S2), lambda bi, zi: (bi, 0, zi, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_df, c, S0, S1, S2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((c, bz + taps - 1, s1p, s2p), jnp.float32),
            pltpu.VMEM((3, bz, s1d, s2d), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=_halo_compiler_params(taps),
        interpret=interpret,
    )(mp, dp)
    return jnp.transpose(out, (0, 2, 3, 4, 1)).astype(orig_dtype)


# ---------------------------------------------------------------------------
# Large-displacement coarse-offset tier (round 4, VERDICT #6)
#
# The tap tiers stop at H=3 (~2.3 voxels); the BASELINE config-3 LungCT
# inspiration/expiration regime displaces tens of voxels, which
# previously fell back to the scalar-core XLA gather (40-61x slower).
# This tier subtracts a per-slab INTEGER offset from the displacement
# before the stencil sees it, so the static tap geometry only has to
# cover the residual:
#
#   - z (the DMA slice dim, untiled -> dynamic starts are free): a per
#     (df row, z-slab) offset cz = round(mean(rel_z over the slab)),
#     applied by shifting the moving-window DMA start; cz rides in an
#     SMEM int32 operand.
#   - y/x (sublane/lane-tiled dims -> dynamic starts need 8/128
#     alignment): a per-MOVING-row offset (cy, cx) = round(mean over
#     the row group), applied OUTSIDE the kernel by a zero-filled
#     per-row dynamic_slice of the padded volume (an XLA bandwidth
#     copy, ~volume bytes). Rows sharing a moving row share (cy, cx) by
#     construction, so the no-S-fold-tiling property is preserved.
#
# The stencil math is unchanged: `_halo_tap_accumulate` subtracts the
# applied offsets from rel, so hat weights see the residual. Exactness
# is per-voxel guarded exactly like the plain tiers (`coarse_bad_mask`
# replicates the applied offsets), with the same repair ladder and the
# XLA gather as the final fallback — every branch exact.
# ---------------------------------------------------------------------------

def COARSE_CMAX() -> int:
    from pulpo_tpu import routing

    return int(routing.get("PULPO_WARP_COARSE_CMAX"))


def use_coarse() -> bool:
    """Coarse-offset tier in the warp cascade. OPT-IN
    (PULPO_WARP_COARSE=1): although the branch only EXECUTES when every
    plain tier's guard failed, merely COMPILING it into the flagship
    OASIS program measured -12.9% composed (0.3138 vs 0.3603 pairs/s,
    round-4 bench A/B — the same program-surface tax that killed three
    round-3 'free' additions). Set it for large-deformation regimes
    (LungCT inspiration/expiration, BASELINE config 3), where it is
    24-36x over the gather fallback (PERF.md coarse-tier table).

    Scope: FORWARD warps only — the backward cascades
    (_dfgrad_cascaded / _mgrad_cascaded) have no coarse branch, so
    large-displacement df-gradients in TRAINING still take the exact
    scalar-core XLA vjp fallback (correct, slow). A coarse mgrad/dfgrad
    tier is future work if LungCT training throughput matters
    (ADVICE r4 #3)."""
    from pulpo_tpu import routing

    return routing.get("PULPO_WARP_COARSE") == "1"


def _rel_coords(df: jnp.ndarray):
    """Per-axis source offsets rel = clip(src) - g, (b_df, *spatial)
    each (the quantity the halo bound is stated on)."""
    from pulpo_tpu.ops.warp import _source_coords

    spatial = df.shape[1:-1]
    coords = _source_coords(df, spatial)
    rels = []
    for a in range(len(spatial)):
        g = jax.lax.broadcasted_iota(jnp.float32, spatial, a)
        rels.append(coords[a] - g[None])
    return rels


def coarse_offsets(df: jnp.ndarray, b_mov: int, bz: int):
    """(cz, cyx): the integer offsets the coarse tier applies.

    cz: (b_df, nz) int32 per (df row, z-slab) = round(mean rel_z over
    the slab), clamped to +-COARSE_CMAX. cyx: (b_mov, 2) int32 per
    MOVING row = round(mean rel_{y,x} over the row\'s df group).
    """
    b_df = df.shape[0]
    S0 = df.shape[1]
    nz = S0 // bz
    relz, rely, relx = _rel_coords(df)
    cz = jnp.round(relz.reshape(b_df, nz, -1).mean(-1)).astype(jnp.int32)
    cz = jnp.clip(cz, -COARSE_CMAX(), COARSE_CMAX())
    grp = lambda r: r.reshape(b_df // b_mov, b_mov, -1).mean((0, 2))
    cyx = jnp.stack([jnp.round(grp(rely)), jnp.round(grp(relx))],
                    axis=-1).astype(jnp.int32)
    cyx = jnp.clip(cyx, -COARSE_CMAX(), COARSE_CMAX())
    return cz, cyx


def coarse_bad_mask(df: jnp.ndarray, halo: int, cz: jnp.ndarray,
                    cyx: jnp.ndarray, b_mov: int, bz: int) -> jnp.ndarray:
    """Per-voxel bool: residual offset (rel - applied coarse) outside
    the stencil\'s [-H, H+1] support on some axis. Must replicate the
    kernel\'s applied offsets EXACTLY (same cz per slab, same cyx per
    row group) — exactness of the tier rests on this mirror."""
    b_df = df.shape[0]
    S0 = df.shape[1]
    rels = _rel_coords(df)
    czv = jnp.repeat(cz, bz, axis=1).astype(jnp.float32)  # (b_df, S0)
    cyxv = jnp.tile(cyx, (b_df // b_mov, 1)).astype(jnp.float32)
    applied = [czv[:, :, None, None],
               cyxv[:, 0][:, None, None, None],
               cyxv[:, 1][:, None, None, None]]
    bad = None
    for r, c in zip(rels, applied):
        res = r - c
        b = (res < -float(halo)) | (res > float(halo) + 1.0)
        bad = b if bad is None else bad | b
    return bad


def _warp_halo_coarse_kernel(mov_hbm, df_hbm, coarse_ref, out_ref, mbuf,
                             dbuf, sem_m, sem_d, *, bz: int, halo: int,
                             spatial, c: int, b_mov: int, cmax: int):
    """One (b_df, z-slab) grid step of the coarse tier.

    mov_hbm: (B, C, S0 + 2H + 1 + 2*cmax, s1p, s2p) — y/x already
    per-row shifted by (cy, cx) and zero-filled outside; source voxel s
    sits at z-index s + H + cmax. coarse_ref: (b_df, nz, 3) int32 SMEM
    rows (cz, cy, cx); cy/cx are constant over nz and equal within a
    moving-row group (coarse_offsets) — the kernel reads them only to
    subtract from rel (the y/x shifts themselves happened outside).
    """
    b = pl.program_id(0)
    zi = pl.program_id(1)
    taps = 2 * halo + 2
    cz = coarse_ref[b, zi, 0]
    cy = coarse_ref[b, zi, 1]
    cx = coarse_ref[b, zi, 2]

    dma_m = pltpu.make_async_copy(
        mov_hbm.at[jax.lax.rem(b, b_mov), :,
                   pl.ds(zi * bz + cz + cmax, bz + taps - 1)],
        mbuf, sem_m)
    dma_d = pltpu.make_async_copy(
        df_hbm.at[b, :, pl.ds(zi * bz, bz)], dbuf, sem_d)
    dma_m.start()
    dma_d.start()
    dma_m.wait()
    dma_d.wait()

    acc = _halo_tap_accumulate(mbuf, dbuf, zi * bz, bz=bz, halo=halo,
                               spatial=spatial, c=c, coarse=(cz, cy, cx))
    out_ref[0] = jnp.stack(list(acc), axis=0)


def _warp_halo_coarse_pallas(moving: jnp.ndarray, df: jnp.ndarray,
                             halo: int, cz: jnp.ndarray, cyx: jnp.ndarray,
                             interpret: bool = False) -> jnp.ndarray:
    """Coarse-tier kernel wrapper (same contract as _warp_halo_pallas;
    exact iff coarse_bad_mask(df, halo, cz, cyx, ...) is all-False —
    callers guard)."""
    spatial = moving.shape[1:-1]
    assert len(spatial) == 3 and df.shape[-1] == 3
    assert df.shape[1:-1] == spatial, (moving.shape, df.shape)
    b = moving.shape[0]
    b_df = df.shape[0]
    assert b_df % b == 0
    c = moving.shape[-1]
    S0, S1, S2 = spatial
    orig_dtype = moving.dtype
    taps = 2 * halo + 2
    cmax = COARSE_CMAX()

    mcf = jnp.transpose(moving.astype(jnp.float32), (0, 4, 1, 2, 3))
    dcf = jnp.transpose(df.astype(jnp.float32), (0, 4, 1, 2, 3))

    s1p = _round_up(S1 + taps - 1, 8)
    s2p = _round_up(S2 + taps - 1, 128)
    # pad every axis by cmax beyond the plain halo pads, then slice the
    # per-row (cy, cx)-shifted window back out (zero-filled shift); z
    # keeps its full cmax-padded extent for the in-kernel dynamic start
    mp_full = jnp.pad(
        mcf, ((0, 0), (0, 0), (halo + cmax, halo + 1 + cmax),
              (halo + cmax, s1p - S1 - halo + cmax),
              (halo + cmax, s2p - S2 - halo + cmax)))

    def shift_row(vol, cy, cx):
        return jax.lax.dynamic_slice(
            vol, (0, 0, cmax + cy, cmax + cx),
            (c, S0 + taps - 1 + 2 * cmax, s1p, s2p))

    mp = jax.vmap(shift_row)(mp_full, cyx[:, 0], cyx[:, 1])

    s1d = _round_up(S1, 8)
    s2d = _round_up(S2, 128)
    dp = jnp.pad(dcf, ((0, 0), (0, 0), (0, 0),
                       (0, s1d - S1), (0, s2d - S2)))

    bz = _halo_bz(S0, S1, S2, taps, c, s1p, s2p, s1d, s2d)
    nz = S0 // bz
    assert cz.shape == (b_df, nz), (cz.shape, (b_df, nz))
    coarse = jnp.concatenate(
        [cz[:, :, None],
         jnp.broadcast_to(jnp.tile(cyx, (b_df // b, 1))[:, None, :],
                          (b_df, nz, 2))], axis=-1).astype(jnp.int32)

    kern = functools.partial(_warp_halo_coarse_kernel, bz=bz, halo=halo,
                             spatial=spatial, c=c, b_mov=b, cmax=cmax)
    out = pl.pallas_call(
        kern,
        grid=(b_df, nz),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(
            (1, c, bz, S1, S2), lambda bi, zi: (bi, 0, zi, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_df, c, S0, S1, S2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((c, bz + taps - 1, s1p, s2p), jnp.float32),
            pltpu.VMEM((3, bz, s1d, s2d), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=_halo_compiler_params(taps),
        interpret=interpret,
    )(mp, dp, coarse)
    return jnp.transpose(out, (0, 2, 3, 4, 1)).astype(orig_dtype)


def warp_coarse_tier(moving: jnp.ndarray, df: jnp.ndarray, halo: int,
                     interpret: bool = False) -> jnp.ndarray:
    """The cascade\'s large-displacement terminal tier: coarse-offset
    stencil, then the repair ladder on the residual-out-of-bound
    voxels, then the full XLA gather. Every branch exact."""
    from pulpo_tpu.ops.warp import warp_image

    b = moving.shape[0]
    spatial = moving.shape[1:-1]
    taps = 2 * halo + 2
    s1p = _round_up(spatial[1] + taps - 1, 8)
    s2p = _round_up(spatial[2] + taps - 1, 128)
    bz = _halo_bz(spatial[0], spatial[1], spatial[2], taps,
                  moving.shape[-1], s1p, s2p,
                  _round_up(spatial[1], 8), _round_up(spatial[2], 128))
    cz, cyx = coarse_offsets(df, b, bz)
    bad = coarse_bad_mask(df, halo, cz, cyx, b, bz)
    n_bad = jnp.sum(bad)
    ks = repair_budgets(df)
    branch = jnp.int32(0)
    for k in reversed(ks):
        branch = jnp.where(n_bad <= k, branch, branch + 1)
    branch = jnp.where(n_bad == 0, 0, branch + 1)

    def dense(m, d):
        return _warp_halo_coarse_pallas(m, d, halo, cz, cyx, interpret)

    def repaired(m, d, bad_, k):
        out = dense(m, d)
        cc = m.shape[-1]
        idx = _repair_indices(bad_.reshape(-1), k)
        df_rows = d.reshape(-1, d.shape[-1])[idx]
        vals = _exact_warp_rows(m, idx, df_rows)
        flat = out.reshape(-1, cc)
        flat = flat.at[idx].set(vals.astype(flat.dtype), mode="drop")
        return flat.reshape(out.shape)

    fns = [lambda m, d, _b: dense(m, d)]
    fns += [functools.partial(
        lambda m, d, b_, _k: repaired(m, d, b_, _k), _k=k) for k in ks]
    fns.append(lambda m, d, _b: warp_image(m, d))
    return jax.lax.switch(branch, fns, moving, df, bad)


def _warp_halo_dfgrad_kernel(mov_hbm, df_hbm, g_hbm, out_ref, mbuf, dbuf,
                             gbuf, sem_m, sem_d, sem_g, *, bz: int,
                             halo: int, spatial, c: int, b_mov: int):
    """One (b_df, z-slab) grid step of the warp's df-cotangent:

      g_df[v, a] = dscale_a(v) * sum_ch g[v, ch] *
                   sum_o  (d w(v, o) / d rel_a)  *  moving[ch, v + o]

    where w is the product of per-axis hat weights and
    dscale_a = S/(S-1) * [src unclipped]  (the chain through
    ops/warp.py:_source_coords). Same halo/tap structure as the forward
    kernel; ~3x the VPU work (three partial accumulators).
    """
    b = pl.program_id(0)
    zi = pl.program_id(1)

    taps = 2 * halo + 2
    dma_m = pltpu.make_async_copy(
        mov_hbm.at[jax.lax.rem(b, b_mov), :, pl.ds(zi * bz, bz + taps - 1)],
        mbuf, sem_m)
    dma_d = pltpu.make_async_copy(
        df_hbm.at[b, :, pl.ds(zi * bz, bz)], dbuf, sem_d)
    dma_g = pltpu.make_async_copy(
        g_hbm.at[b, :, pl.ds(zi * bz, bz)], gbuf, sem_g)
    dma_m.start()
    dma_d.start()
    dma_g.start()
    dma_m.wait()
    dma_d.wait()
    dma_g.wait()

    out_ref[0] = _dfgrad_tap_accumulate(mbuf, dbuf, gbuf, zi * bz, bz=bz,
                                        halo=halo, spatial=spatial, c=c)


def _dfgrad_tap_accumulate(mbuf, dbuf, gbuf, z0, *, bz: int, halo: int,
                           spatial, c: int):
    """The df-cotangent tap accumulation of one z-slab at (dynamic)
    global z `z0` (see `_warp_halo_dfgrad_kernel`); shared by the grid
    and internal-z-loop kernel structures. Returns the stacked
    (3, bz, S1, S2) f32 cotangent."""
    S0, S1, S2 = spatial
    taps = 2 * halo + 2

    shape = (bz, S1, S2)
    gz = (jax.lax.broadcasted_iota(jnp.int32, shape, 0) + z0).astype(
        jnp.float32)
    gy = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32)
    gx = jax.lax.broadcasted_iota(jnp.int32, shape, 2).astype(jnp.float32)
    rel, dscale = [], []
    for a, g, s in ((0, gz, S0), (1, gy, S1), (2, gx, S2)):
        scale = s / (s - 1.0)
        srcu = (g + dbuf[a, :, :S1, :S2]) * scale - 0.5
        src = jnp.clip(srcu, 0.0, s - 1.0)
        rel.append(src - g)
        dscale.append(jnp.where((srcu > 0.0) & (srcu < s - 1.0), scale, 0.0))

    def hat(r, o):
        return jnp.maximum(0.0, 1.0 - jnp.abs(r - o))

    def dhat(r, o):
        # d/dr max(0, 1-|r-o|) with the XLA composition's subgradient at
        # the kinks: w = src - floor(src) gives the right-derivative
        # m[i1] - m[i0] at exact-integer src (reached by f32 rounding a
        # few times per million voxels — measured), i.e. half-open
        # intervals: -1 on [o, o+1), +1 on [o-1, o), 0 elsewhere.
        d = r - o
        return (jnp.where((d >= -1.0) & (d < 0.0), 1.0, 0.0)
                - jnp.where((d >= 0.0) & (d < 1.0), 1.0, 0.0))

    wx = [hat(rel[2], float(ox - halo)) for ox in range(taps)]
    dwx = [dhat(rel[2], float(ox - halo)) for ox in range(taps)]
    small = taps <= UNROLL_TAPS_MAX
    wy = [hat(rel[1], float(oy - halo)) for oy in range(taps)] if small else None
    dwy = [dhat(rel[1], float(oy - halo)) for oy in range(taps)] if small else None

    def z_tap(oz, acc):
        ozf = (oz - halo).astype(jnp.float32)
        wz = hat(rel[0], ozf)
        dwz = dhat(rel[0], ozf)

        def y_body(oy, wyv, dwyv, acc_y):
            az, ay, ax = acc_y
            for ox in range(taps):
                gm = None  # sum_ch g[v, ch] * moving[ch, v + o]
                for ch in range(c):
                    t = (gbuf[ch, :, :S1, :S2]
                         * mbuf[ch, pl.ds(oz, bz), pl.ds(oy, S1),
                                ox:ox + S2])
                    gm = t if gm is None else gm + t
                az = az + gm * (dwz * wyv * wx[ox])
                ay = ay + gm * (wz * dwyv * wx[ox])
                ax = ax + gm * (wz * wyv * dwx[ox])
            return az, ay, ax

        if small:
            for oy in range(taps):
                acc = y_body(oy, wy[oy], dwy[oy], acc)
            return acc

        def y_tap(oy, acc_y):
            oyf = (oy - halo).astype(jnp.float32)
            return y_body(oy, hat(rel[1], oyf), dhat(rel[1], oyf), acc_y)

        return jax.lax.fori_loop(0, taps, y_tap, acc)

    acc = jax.lax.fori_loop(
        0, taps, z_tap, tuple(jnp.zeros(shape, jnp.float32) for _ in range(3)))
    return jnp.stack([a * d for a, d in zip(acc, dscale)], axis=0)


def _warp_halo_dfgrad_zloop_kernel(mov_hbm, df_hbm, g_hbm, out_hbm, mbuf,
                                   dbuf, gbuf, obuf, sem_m, sem_d, sem_g,
                                   sem_o, *, bz: int, halo: int, spatial,
                                   c: int, b_mov: int, nz: int):
    """One grid step per df row, z-slab walk internal — the dfgrad
    counterpart of `_warp_halo_zloop_kernel` (same motivation: amortize
    the per-grid-step fixed overhead S0/bz-fold at unchanged VMEM)."""
    b = pl.program_id(0)
    S0, S1, S2 = spatial
    taps = 2 * halo + 2

    def body(zi, carry):
        dma_m = pltpu.make_async_copy(
            mov_hbm.at[jax.lax.rem(b, b_mov),
                       :, pl.ds(zi * bz, bz + taps - 1)],
            mbuf, sem_m)
        dma_d = pltpu.make_async_copy(
            df_hbm.at[b, :, pl.ds(zi * bz, bz)], dbuf, sem_d)
        dma_g = pltpu.make_async_copy(
            g_hbm.at[b, :, pl.ds(zi * bz, bz)], gbuf, sem_g)
        dma_m.start()
        dma_d.start()
        dma_g.start()
        dma_m.wait()
        dma_d.wait()
        dma_g.wait()
        obuf[:, :, :S1, :S2] = _dfgrad_tap_accumulate(
            mbuf, dbuf, gbuf, zi * bz, bz=bz, halo=halo, spatial=spatial,
            c=c)
        dma_o = pltpu.make_async_copy(
            obuf, out_hbm.at[b, :, pl.ds(zi * bz, bz)], sem_o)
        dma_o.start()
        dma_o.wait()
        return carry

    jax.lax.fori_loop(0, nz, body, jnp.int32(0))


def _warp_halo_dfgrad_pallas(moving: jnp.ndarray, df: jnp.ndarray,
                             g: jnp.ndarray, halo: int,
                             interpret: bool = False,
                             bz_override: int | None = None) -> jnp.ndarray:
    """df-cotangent of the halo warp: moving (B, *spatial, C), df and g
    (B_df, *spatial, 3/C). Returns g_df (B_df, *spatial, 3) in f32.
    Exact (vs the XLA composition's VJP, a.e.) iff the halo bound holds."""
    spatial = moving.shape[1:-1]
    assert len(spatial) == 3 and df.shape[-1] == 3
    assert df.shape[1:-1] == spatial and g.shape[1:-1] == spatial
    b = moving.shape[0]
    b_df = df.shape[0]
    assert b_df % b == 0 and g.shape[0] == b_df
    c = moving.shape[-1]
    assert g.shape[-1] == c
    S0, S1, S2 = spatial
    taps = 2 * halo + 2

    mcf = jnp.transpose(moving.astype(jnp.float32), (0, 4, 1, 2, 3))
    dcf = jnp.transpose(df.astype(jnp.float32), (0, 4, 1, 2, 3))
    gcf = jnp.transpose(g.astype(jnp.float32), (0, 4, 1, 2, 3))

    s1p = _round_up(S1 + taps - 1, 8)
    s2p = _round_up(S2 + taps - 1, 128)
    mp = jnp.pad(mcf, ((0, 0), (0, 0), (halo, halo + 1),
                       (halo, s1p - S1 - halo), (halo, s2p - S2 - halo)))
    s1d = _round_up(S1, 8)
    s2d = _round_up(S2, 128)
    dp = jnp.pad(dcf, ((0, 0), (0, 0), (0, 0),
                       (0, s1d - S1), (0, s2d - S2)))
    # g needs the same halo as moving: taps read g at shifted positions?
    # No - g is read at the OUTPUT voxel only; pad to tile alignment.
    gp = jnp.pad(gcf, ((0, 0), (0, 0), (0, 0),
                       (0, s1d - S1), (0, s2d - S2)))

    env_bz = _routing_get("PULPO_WARP_BZ")
    if bz_override:
        target = bz_override
    elif env_bz:
        target = int(env_bz)
    else:
        n_w = (4 * taps if taps <= UNROLL_TAPS_MAX else 2 * taps) + 10 + 2 * c
        target = 8
        while target > 1:
            est = 4 * (c * (target + taps - 1) * s1p * s2p
                       + (3 + c) * target * s1d * s2d
                       + n_w * target * S1 * S2)
            if est <= 3 * 2**20:  # see the forward's budget comment
                break
            target //= 2
    bz = _pick_slab(S0, target=target)

    if use_zloop():
        s1o = _round_up(S1, 8)
        s2o = _round_up(S2, 128)
        kern = functools.partial(_warp_halo_dfgrad_zloop_kernel, bz=bz,
                                 halo=halo, spatial=spatial, c=c, b_mov=b,
                                 nz=S0 // bz)
        out = pl.pallas_call(
            kern,
            grid=(b_df,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((b_df, 3, S0, s1o, s2o),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((c, bz + taps - 1, s1p, s2p), jnp.float32),
                pltpu.VMEM((3, bz, s1d, s2d), jnp.float32),
                pltpu.VMEM((c, bz, s1d, s2d), jnp.float32),
                pltpu.VMEM((3, bz, s1o, s2o), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
            interpret=interpret,
        )(mp, dp, gp)
        return jnp.transpose(out[..., :S1, :S2], (0, 2, 3, 4, 1))

    kern = functools.partial(_warp_halo_dfgrad_kernel, bz=bz, halo=halo,
                             spatial=spatial, c=c, b_mov=b)
    out = pl.pallas_call(
        kern,
        grid=(b_df, S0 // bz),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 3, bz, S1, S2), lambda bi, zi: (bi, 0, zi, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_df, 3, S0, S1, S2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((c, bz + taps - 1, s1p, s2p), jnp.float32),
            pltpu.VMEM((3, bz, s1d, s2d), jnp.float32),
            pltpu.VMEM((c, bz, s1d, s2d), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(mp, dp, gp)
    return jnp.transpose(out, (0, 2, 3, 4, 1))


def _warp_halo_mgrad_kernel(df_hbm, g_hbm, out_ref, dbuf, gbuf, sem_d,
                            sem_g, *, bz: int, by: int, halo: int,
                            spatial, c: int):
    """One (b, z-slab) grid step of the warp's moving-cotangent:

      gm[u, ch] = sum_o  W(df at u-o, o) * g[u-o, ch]

    — the transpose of the bounded gather is itself a bounded halo
    GATHER (the scatter from output voxel v lands only within its own
    [-H, H+1] support), with the PRIMAL hat weights evaluated at the
    neighbouring output voxels v = u-o. No hat derivatives, no scatter
    instruction. Extended (haloed) region: lo = H+1, hi = H per axis;
    zero-padded g kills out-of-volume contributions exactly (padded df
    produces garbage weights only where g is zero).
    """
    b = pl.program_id(0)
    zi = pl.program_id(1)
    yi = pl.program_id(2)
    S0, S1, S2 = spatial
    taps = 2 * halo + 2
    ez = bz + 2 * halo + 1
    eyp = dbuf.shape[2]  # sublane-rounded y window (by + 2H+1, mult of 8)

    dma_d = pltpu.make_async_copy(
        df_hbm.at[b, :, pl.ds(zi * bz, ez), pl.ds(yi * by, eyp)], dbuf, sem_d)
    dma_g = pltpu.make_async_copy(
        g_hbm.at[b, :, pl.ds(zi * bz, ez), pl.ds(yi * by, eyp)], gbuf, sem_g)
    dma_d.start()
    dma_g.start()
    dma_d.wait()
    dma_g.wait()

    shape = (bz, by, S2)
    # interior (output-voxel) global coordinates of this (z, y) block
    giz = (jax.lax.broadcasted_iota(jnp.int32, shape, 0) + zi * bz).astype(
        jnp.float32)
    giy = (jax.lax.broadcasted_iota(jnp.int32, shape, 1) + yi * by).astype(
        jnp.float32)
    gix = jax.lax.broadcasted_iota(jnp.int32, shape, 2).astype(jnp.float32)

    # Per tap, everything is computed on the SHIFTED window read from
    # the refs (pl.ds dynamic start in z only; static unaligned y/x
    # starts are fine — same pattern as the forward/dfgrad kernels).
    # Real Mosaic has no dynamic_slice on VALUES, so the weights are
    # recomputed per tap from the shifted df window instead of slicing
    # precomputed extended-region weight arrays.
    acc = tuple(jnp.zeros(shape, jnp.float32) for _ in range(c))

    def z_tap(oz, acc):
        odz = (oz - halo).astype(jnp.float32)
        sz = 2 * halo + 1 - oz  # buffer start of the shifted window
        for oy in range(taps):
            ody = float(oy - halo)
            sy = 2 * halo + 1 - oy
            for ox in range(taps):
                odx = float(ox - halo)
                sx = 2 * halo + 1 - ox
                w = None
                for a, gi, od, s in ((0, giz, odz, S0), (1, giy, ody, S1),
                                     (2, gix, odx, S2)):
                    vcoord = gi - od  # global coords of source voxel v'
                    dfa = dbuf[a, pl.ds(sz, bz), sy:sy + by, sx:sx + S2]
                    src = jnp.clip((vcoord + dfa) * (s / (s - 1.0)) - 0.5,
                                   0.0, s - 1.0)
                    ha = jnp.maximum(0.0, 1.0 - jnp.abs((src - vcoord) - od))
                    w = ha if w is None else w * ha
                acc = tuple(
                    acc[ch] + w * gbuf[ch, pl.ds(sz, bz),
                                       sy:sy + by, sx:sx + S2]
                    for ch in range(c))
        return acc

    acc = jax.lax.fori_loop(0, taps, z_tap, acc)
    out_ref[0] = jnp.stack(list(acc), axis=0)


def _warp_halo_mgrad_pallas(df: jnp.ndarray, g: jnp.ndarray, halo: int,
                            interpret: bool = False) -> jnp.ndarray:
    """Moving-cotangent of the halo warp: df (B, *spatial, 3), g
    (B, *spatial, C) -> gm (B, *spatial, C) in f32. Exact (matches the
    XLA composition's VJP wrt `moving` up to fp order) iff the halo
    bound holds for df. Requires matching batches (the sample-tiled
    b_df != b_mov case would need a cross-sample reduction — not
    needed by the squaring step, its only caller)."""
    spatial = df.shape[1:-1]
    assert len(spatial) == 3 and df.shape[-1] == 3
    assert g.shape[1:-1] == spatial and g.shape[0] == df.shape[0]
    b = df.shape[0]
    c = g.shape[-1]
    S0, S1, S2 = spatial
    taps = 2 * halo + 2
    lo = halo + 1

    dcf = jnp.transpose(df.astype(jnp.float32), (0, 4, 1, 2, 3))
    gcf = jnp.transpose(g.astype(jnp.float32), (0, 4, 1, 2, 3))

    # Mosaic's scoped-VMEM stack scales with the (bz, by, S2) window of
    # the (2H+2)^2 unrolled (oy, ox) tap chain (measured: 18.4M at a
    # 4x48x56 window, taps=6 — over the 16M limit). Block the y axis so
    # the window stays small: by must divide S1 and, when blocking, be
    # a multiple of 8 (sublane-aligned DMA starts). bz = 1.
    bz = 1
    if S1 <= 32:
        by = S1
    else:
        cands = [d for d in range(8, S1 + 1, 8)
                 if S1 % d == 0 and d * S2 <= 4096]
        by = max(cands) if cands else S1
    ny = S1 // by
    ez = bz + 2 * halo + 1
    eyp = _round_up(by + 2 * halo + 1, 8)
    s1p = (ny - 1) * by + eyp
    s2p = _round_up(S2 + 2 * halo + 1, 128)
    dp = jnp.pad(dcf, ((0, 0), (0, 0), (lo, halo),
                       (lo, s1p - S1 - lo), (lo, s2p - S2 - lo)))
    gp = jnp.pad(gcf, ((0, 0), (0, 0), (lo, halo),
                       (lo, s1p - S1 - lo), (lo, s2p - S2 - lo)))

    kern = functools.partial(_warp_halo_mgrad_kernel, bz=bz, by=by,
                             halo=halo, spatial=spatial, c=c)
    out = pl.pallas_call(
        kern,
        grid=(b, S0 // bz, ny),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, c, bz, by, S2), lambda bi, zi, yi: (bi, 0, zi, yi, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, S0, S1, S2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((3, ez, eyp, s2p), jnp.float32),
            pltpu.VMEM((c, ez, eyp, s2p), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(dp, gp)
    return jnp.transpose(out, (0, 2, 3, 4, 1))


def _mgrad_repaired(moving, df, g, bad, halo, k, interpret=False):
    """mgrad stencil + exact repair: contributions FROM the (<= k)
    out-of-bound output voxels are excluded by zeroing their cotangent
    rows before the stencil, then added back exactly via jax.vjp of
    `_exact_warp_rows` wrt moving."""
    g_clean = g * (1.0 - bad[..., None].astype(g.dtype))
    out = _warp_halo_mgrad_pallas(df, g_clean, halo, interpret)
    idx = _repair_indices(bad.reshape(-1), k)
    df_rows = df.reshape(-1, df.shape[-1])[idx]
    g_rows = g.astype(jnp.float32).reshape(-1, g.shape[-1])[idx]
    _, vjp = jax.vjp(
        lambda m: _exact_warp_rows(m, idx, df_rows), moving)
    return out + vjp(g_rows)[0].astype(jnp.float32)


def _mgrad_cascaded(moving, df, g, halos, interpret=False):
    """Moving-cotangent via the same guard cascade as the forward /
    dfgrad: Pallas mgrad kernel at the smallest tier whose bound holds,
    sparse-repaired within the budget, the XLA composition's VJP
    beyond. Requires df batch == moving batch (see mgrad_pallas)."""
    from pulpo_tpu.ops.warp import warp_image

    def xla_mgrad(m, d, gg):
        _, vjp = jax.vjp(warp_image, m, d)
        return vjp(gg)[0].astype(jnp.float32)

    if not halos:
        return xla_mgrad(moving, df, g)
    h, rest = halos[0], halos[1:]
    if not rest:
        ks = repair_budgets(df)
        bad = halo_bad_mask(df, h)
        n_bad = jnp.sum(bad)
        branch = jnp.int32(0)
        for k in reversed(ks):
            branch = jnp.where(n_bad <= k, branch, branch + 1)
        branch = jnp.where(n_bad == 0, 0, branch + 1)
        fns = [lambda m, d, gg, _b: _warp_halo_mgrad_pallas(d, gg, h,
                                                            interpret)]
        fns += [functools.partial(
            lambda m, d, gg, b, _k: _mgrad_repaired(m, d, gg, b, h, _k,
                                                    interpret),
            _k=k) for k in ks]
        fns.append(lambda m, d, gg, _b: xla_mgrad(m, d, gg))
        return jax.lax.switch(branch, fns, moving, df, g, bad)
    return jax.lax.cond(
        halo_bound_ok(df, h),
        lambda m, d, gg: _warp_halo_mgrad_pallas(d, gg, h, interpret),
        lambda m, d, gg: _mgrad_cascaded(m, d, gg, rest, interpret),
        moving, df, g)


def halo_bound_ok(df: jnp.ndarray, halo: int) -> jnp.ndarray:
    """Scalar bool: every per-axis source offset |clip(src) - g| fits
    the stencil (taps -H..H+1 cover rel in [-H, H+1])."""
    from pulpo_tpu.ops.warp import _source_coords

    spatial = df.shape[1:-1]
    coords = _source_coords(df, spatial)
    ok = jnp.bool_(True)
    for a, s in enumerate(spatial):
        g = jax.lax.broadcasted_iota(jnp.float32, spatial, a)
        r = coords[a] - g[None]
        ok &= (jnp.min(r) >= -float(halo)) & (jnp.max(r) <= float(halo) + 1.0)
    return ok


def halo_bad_mask(df: jnp.ndarray, halo: int) -> jnp.ndarray:
    """Per-voxel bool (B_df, *spatial): some axis source offset falls
    outside the stencil's [-H, H+1] support."""
    from pulpo_tpu.ops.warp import _source_coords

    spatial = df.shape[1:-1]
    coords = _source_coords(df, spatial)
    bad = None
    for a in range(len(spatial)):
        g = jax.lax.broadcasted_iota(jnp.float32, spatial, a)
        r = coords[a] - g[None]
        b = (r < -float(halo)) | (r > float(halo) + 1.0)
        bad = b if bad is None else bad | b
    return bad


def repair_fracs() -> tuple[float, ...]:
    """Repair budgets as fractions of output voxels (the K ladder of
    the sparse exact fix-up), ascending. The searchsorted compaction
    scales with K (measured full-res v5e: 0.074 s at K=64K, 0.57 s at
    K=1.1M), so the cascade branches on the actual out-of-bound count
    and runs the smallest budget that fits: trained models (thin
    large-displacement tails) hit the 0.1% tier at ~0.2 s overhead;
    init-state dfs (broader tails) still clear the 2% tier at ~0.7 s —
    both far under the 4.5 s full XLA gather."""
    from pulpo_tpu import routing

    spec = routing.get("PULPO_WARP_REPAIR_FRAC")
    return tuple(sorted(float(f) for f in spec.split(",") if f))


def repair_budgets(df: jnp.ndarray) -> tuple[int, ...]:
    """Static repair-point budgets (K ladder) from repair_fracs()."""
    nvox = df.shape[0] * math.prod(df.shape[1:-1])
    return tuple(max(1, int(f * nvox)) for f in repair_fracs())


def _repair_indices(bad_flat: jnp.ndarray, k: int) -> jnp.ndarray:
    """Flat indices of the first k set bits of `bad_flat`; slots past
    the true count hold n = bad_flat.size (gathers clip, scatters
    drop). cumsum + searchsorted instead of jnp.nonzero(size=k): the
    nonzero lowering scatters all n rows on the scalar core (measured
    0.53 s at n=55M full-res), while the prefix sum is a vector op
    (0.05 s) and the k binary searches touch only k*log2(n) rows."""
    cs = jnp.cumsum(bad_flat.astype(jnp.int32))
    return jnp.searchsorted(cs, jnp.arange(1, k + 1, dtype=jnp.int32))


def _exact_warp_rows(moving: jnp.ndarray, flat_idx: jnp.ndarray,
                     df_rows: jnp.ndarray,
                     cf_layout: tuple | None = None) -> jnp.ndarray:
    """Exact trilinear warp values (K, C) at K flattened (b_df, *spatial)
    output voxels, given their displacement rows (K, nd). Bit-matches
    ops/warp.py:warp_image (same coordinate/corner/weight formulas), so
    jax.vjp of this in `df_rows` is the exact per-point df-cotangent.

    `cf_layout=(spatial, moff)`: `moving` is a CF halo-padded
    (B, C, zp, yp, xp) array with interior at offset `moff` per axis
    (the CF cascade's operand) — the corner gathers remap through the
    padded strides; weights/sums are unchanged, so results stay
    bit-identical to the channels-last call."""
    if cf_layout is not None:
        spatial, moff = cf_layout
        ndims = len(spatial)
        b = moving.shape[0]
        c = moving.shape[1]
        nvox = math.prod(spatial)
        zp, yp, xp = moving.shape[2:]
        pad_strides = (yp * xp, xp, 1)
        base_off = moff * sum(pad_strides)
        flat_ch = [moving[:, ci].reshape(-1) for ci in range(c)]
        vol_stride = zp * yp * xp
    else:
        spatial = moving.shape[1:-1]
        ndims = len(spatial)
        b = moving.shape[0]
        c = moving.shape[-1]
        nvox = math.prod(spatial)

    bi = flat_idx // nvox
    r = flat_idx % nvox
    gs = []
    for s in reversed(spatial):
        gs.append(r % s)
        r = r // s
    gs = gs[::-1]

    i0, i1, w = [], [], []
    for a, s in enumerate(spatial):
        src = (gs[a].astype(jnp.float32) + df_rows[:, a].astype(jnp.float32)
               ) * (s / (s - 1.0)) - 0.5
        src = jnp.clip(src, 0.0, s - 1.0)
        f = jnp.floor(src)
        idx0 = f.astype(jnp.int32)
        i0.append(idx0)
        i1.append(jnp.minimum(idx0 + 1, s - 1))
        w.append(src - f)

    if cf_layout is not None:
        strides = list(pad_strides)
        base = (bi % b) * vol_stride + base_off
    else:
        strides = []
        acc = 1
        for s in reversed(spatial):
            strides.append(acc)
            acc *= s
        strides = strides[::-1]
        base = (bi % b) * nvox

    out = None
    for corner in range(2**ndims):
        idx = base
        weight = None
        for ax in range(ndims):
            hi = (corner >> ax) & 1
            iax = i1[ax] if hi else i0[ax]
            wax = w[ax] if hi else (1.0 - w[ax])
            idx = idx + iax * strides[ax]
            weight = wax if weight is None else weight * wax
        if cf_layout is not None:
            chans = [jnp.take(flat_ch[ci].astype(jnp.float32), idx, axis=0)
                     for ci in range(c)]
        else:
            chans = [jnp.take(moving[..., ci].reshape(-1).astype(jnp.float32),
                              idx, axis=0) for ci in range(c)]
        contrib = jnp.stack(chans, axis=-1) * weight[:, None]
        out = contrib if out is None else out + contrib
    return out


def warp_repaired(moving: jnp.ndarray, df: jnp.ndarray, bad: jnp.ndarray,
                  halo: int, k: int, interpret: bool = False) -> jnp.ndarray:
    """H-stencil everywhere + exact sparse fix-up: the (<= k)
    out-of-bound voxels flagged by `bad` (= halo_bad_mask(df, halo))
    are recomputed with the exact gather formula at K points and
    scattered in. The stencil output is garbage exactly where `bad` is
    set. Callers must guard sum(bad) <= k (warp_cascaded does)."""
    out = _warp_halo_pallas(moving, df, halo, interpret)
    c = moving.shape[-1]
    idx = _repair_indices(bad.reshape(-1), k)
    df_rows = df.reshape(-1, df.shape[-1])[idx]
    vals = _exact_warp_rows(moving, idx, df_rows)
    flat = out.reshape(-1, c)
    flat = flat.at[idx].set(vals.astype(flat.dtype), mode="drop")
    return flat.reshape(out.shape)


def halo_cascade() -> tuple[int, ...]:
    """Halo tiers tried in order (comma-separated PULPO_WARP_HALO).

    Default (2, 3): tier 1 covers the near-identity dfs of SVF pipelines
    and early training at 75x the gather's speed (measured v5e); tier 2
    covers deformations up to ~2.3 voxels per axis at 49x; anything
    larger falls back to the exact XLA gather. H >= 4 tiers fail to
    compile on real Mosaic at full-res (scoped-VMEM stack overflow from
    the unrolled (oy, ox) tap chain; the fori-oy restructure is rejected
    for dynamic sublane slices) — measured round 3, don't raise this
    outside interpret mode.
    """
    from pulpo_tpu import routing

    spec = routing.get("PULPO_WARP_HALO")
    return tuple(int(h) for h in spec.split(",") if h)


# below this output voxel count the per-slab grid/DMA overhead loses to
# the XLA gather (same breakpoint family as warp_local.MIN_PALLAS_VOXELS)
MIN_HALO_VOXELS = 32768


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def warp_halo_guarded(moving: jnp.ndarray, df: jnp.ndarray, halo: int,
                      interpret: bool = False) -> jnp.ndarray:
    """Runtime-guarded warp: Pallas halo stencil when every source
    offset is within H voxels, XLA gather fallback otherwise."""
    from pulpo_tpu.ops.warp import warp_image

    return jax.lax.cond(
        halo_bound_ok(df, halo),
        lambda m, d: _warp_halo_pallas(m, d, halo, interpret),
        warp_image,
        moving, df)


def _warp_halo_fwd(moving, df, halo, interpret):
    return warp_halo_guarded(moving, df, halo, interpret), (moving, df)


def _warp_halo_bwd(halo, interpret, res, g):
    from pulpo_tpu.ops.warp import warp_image

    moving, df = res
    _, vjp = jax.vjp(warp_image, moving, df)
    return vjp(g)


warp_halo_guarded.defvjp(_warp_halo_fwd, _warp_halo_bwd)


def warp_cascaded(moving: jnp.ndarray, df: jnp.ndarray,
                  halos: tuple[int, ...] | None = None,
                  interpret: bool = False) -> jnp.ndarray:
    """Tiered guarded warp: try each halo size in order (smallest =
    fastest kernel first); beyond the last tier, run the largest-tier
    stencil with a sparse exact repair of the out-of-bound voxels
    (<= 1% of the volume by default — one outlier no longer forfeits
    the kernel); only past THAT budget fall back to the full XLA
    gather. All tiers compile into the program; exactly one branch
    executes per call. Every branch is exact (tests/test_kernels.py).
    """
    if halos is None:
        halos = halo_cascade()
    if not halos:
        from pulpo_tpu.ops.warp import warp_image

        return warp_image(moving, df)
    h, rest = halos[0], halos[1:]
    if not rest:
        from pulpo_tpu.ops.warp import warp_image

        ks = repair_budgets(df)
        bad = halo_bad_mask(df, h)
        n_bad = jnp.sum(bad)
        # branch 0: clean stencil; 1..len(ks): smallest repair budget
        # that fits; last: full XLA gather
        branch = jnp.int32(0)
        for k in reversed(ks):
            branch = jnp.where(n_bad <= k, branch, branch + 1)
        branch = jnp.where(n_bad == 0, 0, branch + 1)
        fns = [lambda m, d, _b: _warp_halo_pallas(m, d, h, interpret)]
        fns += [functools.partial(
            lambda m, d, b, _k: warp_repaired(m, d, b, h, _k, interpret),
            _k=k) for k in ks]
        if use_coarse():
            # large-displacement terminal tier: coarse-offset stencil
            # (+ its own repair ladder + gather) instead of going
            # straight to the 40-61x-slower gather
            fns.append(lambda m, d, _b: warp_coarse_tier(m, d, h, interpret))
        else:
            fns.append(lambda m, d, _b: warp_image(m, d))
        return jax.lax.switch(branch, fns, moving, df, bad)
    return jax.lax.cond(
        halo_bound_ok(df, h),
        lambda m, d: _warp_halo_pallas(m, d, h, interpret),
        lambda m, d: warp_cascaded(m, d, rest, interpret),
        moving, df)


def _dfgrad_repaired(moving, df, g, bad, halo, k, interpret=False):
    """dfgrad stencil + exact per-point repair: the same K bad voxels
    as the forward get their df-cotangent from jax.vjp of
    `_exact_warp_rows` (bit-matching the XLA composition)."""
    out = _warp_halo_dfgrad_pallas(moving, df, g, halo, interpret)
    idx = _repair_indices(bad.reshape(-1), k)
    nd = df.shape[-1]
    df_rows = df.reshape(-1, nd)[idx]
    g_rows = g.astype(jnp.float32).reshape(-1, g.shape[-1])[idx]
    _, vjp = jax.vjp(lambda dr: _exact_warp_rows(moving, idx, dr), df_rows)
    rows = vjp(g_rows)[0]
    flat = out.reshape(-1, nd)
    flat = flat.at[idx].set(rows.astype(flat.dtype), mode="drop")
    return flat.reshape(out.shape)


def _dfgrad_cascaded(moving, df, g, halos, interpret=False):
    """df-cotangent via the same guard cascade as the forward: the
    Pallas dfgrad kernel at the smallest tier whose bound holds, the
    sparse-repaired kernel within the repair budget, the XLA
    composition's VJP beyond."""
    from pulpo_tpu.ops.warp import warp_image

    def xla_dfgrad(m, d, gg):
        _, vjp = jax.vjp(warp_image, m, d)
        return vjp(gg)[1].astype(jnp.float32)

    if not halos:
        return xla_dfgrad(moving, df, g)
    h, rest = halos[0], halos[1:]
    if not rest:
        ks = repair_budgets(df)
        bad = halo_bad_mask(df, h)
        n_bad = jnp.sum(bad)
        branch = jnp.int32(0)
        for k in reversed(ks):
            branch = jnp.where(n_bad <= k, branch, branch + 1)
        branch = jnp.where(n_bad == 0, 0, branch + 1)
        fns = [lambda m, d, gg, _b: _warp_halo_dfgrad_pallas(m, d, gg, h,
                                                             interpret)]
        fns += [functools.partial(
            lambda m, d, gg, b, _k: _dfgrad_repaired(m, d, gg, b, h, _k,
                                                     interpret),
            _k=k) for k in ks]
        fns.append(lambda m, d, gg, _b: xla_dfgrad(m, d, gg))
        return jax.lax.switch(branch, fns, moving, df, g, bad)
    return jax.lax.cond(
        halo_bound_ok(df, h),
        lambda m, d, gg: _warp_halo_dfgrad_pallas(m, d, gg, h, interpret),
        lambda m, d, gg: _dfgrad_cascaded(m, d, gg, rest, interpret),
        moving, df, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def warp_cascaded_grad(moving: jnp.ndarray, df: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """warp_cascaded with a Pallas backward for the df-cotangent (the
    hot gradient: `moving` is the input image in the decode, so its
    cotangent subgraph is dead code XLA removes; `df` carries the
    training gradient and its XLA VJP re-runs scalar-core gathers)."""
    return warp_cascaded(moving, df, interpret=interpret)


def _wc_fwd(moving, df, interpret):
    return warp_cascaded_grad(moving, df, interpret), (moving, df)


def _wc_bwd(interpret, res, g):
    from pulpo_tpu.ops.warp import warp_image

    moving, df = res
    _, vjp = jax.vjp(warp_image, moving, df)
    g_mov = vjp(g)[0]  # scatter subgraph; DCE'd when moving-grad unused
    g_df = _dfgrad_cascaded(moving, df, g, halo_cascade(), interpret)
    return g_mov, g_df.astype(df.dtype)


warp_cascaded_grad.defvjp(_wc_fwd, _wc_bwd)


# ---------------------------------------------------------------------------
# Channels-first (CF) cascade — round 5, PERF.md lever 1.
#
# Same tier ladder / repair / guard semantics as `warp_cascaded`, but
# the df operand arrives ALREADY in the kernels' channels-first
# tile-padded layout (and the moving operand in CF halo-padded form),
# so the per-call CL->CF transpose + pad staging — the dominant
# "pallas custom-call staging" byte class of the round-3 HLO
# accounting — never exists. Two df layouts are accepted, described by
# the static per-axis interior offset `doff`:
#
#   doff=1: layout A of the squaring chain (kernels/warp_local.cf_pad):
#           (B, 3, S0+2, r8(S1+2), r128(S2+2)).
#   doff=0: resize-native layout (ops/warp.resize_vecfield_cf):
#           (B, 3, S0, r8(S1), r128(S2)) — bit-identical to the dp the
#           channels-last wrapper builds internally.
#
# Pad contents only need to be FINITE (out-of-volume taps carry hat
# weight exactly 0 under the border clamp); the sparse repair and the
# terminal gather read interior voxels only. Every branch bit-matches
# its channels-last counterpart (tests/test_cf.py).
# ---------------------------------------------------------------------------


def _rel_coords_cf(dcf: jnp.ndarray, spatial, doff: int):
    """Per-axis source offsets rel = clip(src) - g computed from a CF
    padded df; bit-matches `_rel_coords` on the interior."""
    S0, S1, S2 = spatial
    d = dcf[:, :, doff:doff + S0, doff:doff + S1, doff:doff + S2]
    rels = []
    for a, s in enumerate(spatial):
        g = jax.lax.broadcasted_iota(jnp.float32, spatial, a)
        loc = g[None] + d[:, a].astype(jnp.float32)
        src = jnp.clip(loc * (s / (s - 1.0)) - 0.5, 0.0, s - 1.0)
        rels.append(src - g[None])
    return rels


def halo_bound_ok_cf(dcf: jnp.ndarray, spatial, doff: int,
                     halo: int) -> jnp.ndarray:
    ok = jnp.bool_(True)
    for r in _rel_coords_cf(dcf, spatial, doff):
        ok &= (jnp.min(r) >= -float(halo)) & (jnp.max(r) <= float(halo) + 1.0)
    return ok


def halo_bad_mask_cf(dcf: jnp.ndarray, spatial, doff: int,
                     halo: int) -> jnp.ndarray:
    bad = None
    for r in _rel_coords_cf(dcf, spatial, doff):
        b = (r < -float(halo)) | (r > float(halo) + 1.0)
        bad = b if bad is None else bad | b
    return bad


def _df_rows_cf(dcf: jnp.ndarray, spatial, doff: int,
                flat_idx: jnp.ndarray) -> jnp.ndarray:
    """(K, 3) df values at K flattened interior (b_df, *spatial) voxels,
    gathered straight from the padded CF planes (pure index remap — the
    interior is never materialized)."""
    S0, S1, S2 = spatial
    nvox = S0 * S1 * S2
    zp, yp, xp = dcf.shape[2:]
    bi = flat_idx // nvox
    r = flat_idx % nvox
    gx = r % S2
    gy = (r // S2) % S1
    gz = r // (S1 * S2)
    pidx = ((bi * zp + gz + doff) * yp + gy + doff) * xp + gx + doff
    return jnp.stack(
        [jnp.take(dcf[:, a].reshape(-1), pidx, axis=0) for a in range(3)],
        axis=-1)


def warp_repaired_cf(mp: jnp.ndarray, dcf: jnp.ndarray, bad: jnp.ndarray,
                     halo: int, k: int, *, spatial, c: int, b_mov: int,
                     moff: int, doff: int,
                     interpret: bool = False) -> jnp.ndarray:
    """CF `warp_repaired`: H-stencil everywhere + exact sparse fix-up of
    the <= k out-of-bound voxels, scattered into the CF output."""
    out = _warp_halo_pallas_cf(mp, dcf, halo, spatial=spatial, c=c,
                               b_mov=b_mov, moff=moff, doff=doff,
                               interpret=interpret)
    S0, S1, S2 = spatial
    nvox = S0 * S1 * S2
    idx = _repair_indices(bad.reshape(-1), k)
    df_rows = _df_rows_cf(dcf, spatial, doff, idx)
    vals = _exact_warp_rows(mp, idx, df_rows, cf_layout=(spatial, moff))
    b_df = dcf.shape[0]
    out3 = out.reshape(b_df, c, nvox)
    bi = idx // nvox
    vi = idx % nvox
    out3 = out3.at[bi, :, vi].set(vals.astype(out.dtype), mode="drop")
    return out3.reshape(out.shape)


def _warp_halo_pallas_cf(mp: jnp.ndarray, dcf: jnp.ndarray, halo: int, *,
                         spatial, c: int, b_mov: int, moff: int, doff: int,
                         interpret: bool = False) -> jnp.ndarray:
    """Raw CF kernel wrapper: mp (B, C, S0+2H+1-ish, s1p, s2p) halo-
    padded moving with interior at `moff`; dcf CF padded df with
    interior at `doff`. Returns (B_df, C, S0, S1, S2) f32 — unpadded
    channels-first (a pure reshape away from channels-last for C=1
    image warps)."""
    S0, S1, S2 = spatial
    b_df = dcf.shape[0]
    taps = 2 * halo + 2
    s1p_m, s2p_m = mp.shape[3:]
    s1d, s2d = dcf.shape[3:]
    bz = _halo_bz(S0, S1, S2, taps, c, s1p_m, s2p_m, s1d, s2d)
    kern = functools.partial(_warp_halo_kernel, bz=bz, halo=halo,
                             spatial=spatial, c=c, b_mov=b_mov,
                             moff=moff, doff=doff)
    # the 20.33M small-shape stack OOM was the CL bz=8 bug (fixed by
    # the _halo_bz clamp), not a CF need — default to the compiler's
    # 16M like the CL twins (the scheduler WILL use whatever stack
    # budget it is given: pos_head 100M-cap lesson, and arm A of the
    # round-5 CF A/B ran -1.8% with a blanket 64M). PULPO_CF_VMEM_MB
    # lifts it if a shape ever needs it.
    cparams = _halo_compiler_params(taps)
    mb = int(_routing_get("PULPO_CF_VMEM_MB") or "0")
    if cparams is None and mb:
        cparams = pltpu.CompilerParams(vmem_limit_bytes=mb * 1024 * 1024)
    return pl.pallas_call(
        kern,
        grid=(b_df, S0 // bz),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, c, bz, S1, S2), lambda bi, zi: (bi, 0, zi, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_df, c, S0, S1, S2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((c, bz + taps - 1, s1p_m, s2p_m), jnp.float32),
            pltpu.VMEM((3, bz, s1d, s2d), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=cparams,
        interpret=interpret,
    )(mp, dcf)


def _cf_virtual_cl(arr: jnp.ndarray, spatial, off: int) -> jnp.ndarray:
    """Padded CF -> channels-last interior (materializes — terminal
    fallback branches only)."""
    S0, S1, S2 = spatial
    interior = arr[:, :, off:off + S0, off:off + S1, off:off + S2]
    return jnp.transpose(interior, (0, 2, 3, 4, 1))


def warp_cascaded_cf(mp: jnp.ndarray, dcf: jnp.ndarray, *, spatial,
                     c: int, b_mov: int, moff: int, doff: int,
                     halos: tuple[int, ...] | None = None,
                     interpret: bool = False) -> jnp.ndarray:
    """CF `warp_cascaded`: tier ladder + sparse repair + exact terminal
    fallback, with both operands already channels-first. Returns
    (B_df, C, S0, S1, S2) f32."""
    from pulpo_tpu.ops.warp import warp_image

    if halos is None:
        halos = halo_cascade()

    def terminal(m, d, _b):
        mov_cl = _cf_virtual_cl(m, spatial, moff)
        df_cl = _cf_virtual_cl(d, spatial, doff)
        out_cl = (warp_coarse_tier(mov_cl, df_cl, halos[-1], interpret)
                  if (use_coarse() and halos) else warp_image(mov_cl, df_cl))
        return jnp.transpose(out_cl, (0, 4, 1, 2, 3)).astype(jnp.float32)

    if not halos:
        return terminal(mp, dcf, None)
    h, rest = halos[0], halos[1:]
    if not rest:
        nvox_total = dcf.shape[0] * math.prod(spatial)
        ks = tuple(max(1, int(f * nvox_total)) for f in repair_fracs())
        bad = halo_bad_mask_cf(dcf, spatial, doff, h)
        n_bad = jnp.sum(bad)
        branch = jnp.int32(0)
        for k in reversed(ks):
            branch = jnp.where(n_bad <= k, branch, branch + 1)
        branch = jnp.where(n_bad == 0, 0, branch + 1)
        fns = [lambda m, d, _b: _warp_halo_pallas_cf(
            m, d, h, spatial=spatial, c=c, b_mov=b_mov, moff=moff,
            doff=doff, interpret=interpret)]
        fns += [functools.partial(
            lambda m, d, b, _k: warp_repaired_cf(
                m, d, b, h, _k, spatial=spatial, c=c, b_mov=b_mov,
                moff=moff, doff=doff, interpret=interpret),
            _k=k) for k in ks]
        fns.append(terminal)
        return jax.lax.switch(branch, fns, mp, dcf, bad)
    return jax.lax.cond(
        halo_bound_ok_cf(dcf, spatial, doff, h),
        lambda m, d: _warp_halo_pallas_cf(
            m, d, h, spatial=spatial, c=c, b_mov=b_mov, moff=moff,
            doff=doff, interpret=interpret),
        lambda m, d: warp_cascaded_cf(
            m, d, spatial=spatial, c=c, b_mov=b_mov, moff=moff, doff=doff,
            halos=rest, interpret=interpret),
        mp, dcf)


def _repad_layoutA_for_halo(vp: jnp.ndarray, spatial, halo: int) -> jnp.ndarray:
    """Layout A (interior offset 1) -> the cascade kernels' moving
    layout for tier `halo` (interior offset H, z size S0+2H+1, trailing
    dims tile-aligned) in ONE lax.pad (negative high pads trim layout
    A's own tile padding where the target is tighter). Zero fill keeps
    the moving pads exact."""
    S0, S1, S2 = spatial
    taps = 2 * halo + 2
    tz = S0 + 2 * halo + 1
    ty = _round_up(S1 + taps - 1, 8)
    tx = _round_up(S2 + taps - 1, 128)
    zp, yp, xp = vp.shape[2:]
    lo = halo - 1
    cfgs = [(0, 0, 0), (0, 0, 0),
            (lo, tz - zp - lo, 0),
            (lo, ty - yp - lo, 0),
            (lo, tx - xp - lo, 0)]
    return jax.lax.pad(vp, jnp.float32(0.0), cfgs)


def squaring_beyond_cf(vp: jnp.ndarray, spatial,
                       halos: tuple[int, ...],
                       interpret: bool = False) -> jnp.ndarray:
    """Past-sub-voxel squaring step on layout A: vec + warp(vec, vec)
    through the CF cascade — the df operand IS layout A (doff=1), the
    moving operand is a single zero-padded CF re-pad of it, and the
    result is re-padded back to layout A (zeros; adding them to vp's
    finite pads keeps the pad-finiteness invariant)."""
    S0, S1, S2 = spatial
    b = vp.shape[0]
    h = max(halos)
    mp = _repad_layoutA_for_halo(vp, spatial, h)
    w = warp_cascaded_cf(mp, vp, spatial=spatial, c=3, b_mov=b,
                         moff=h, doff=1, halos=halos, interpret=interpret)
    zp, yp, xp = vp.shape[2:]
    wpad = jnp.pad(w, ((0, 0), (0, 0), (1, zp - S0 - 1),
                       (1, yp - S1 - 1), (1, xp - S2 - 1)))
    return vp + wpad


def mov_to_cf(moving: jnp.ndarray, halo: int) -> jnp.ndarray:
    """Channels-last moving image -> the cascade kernels' CF halo-padded
    layout for tier `halo` (the staging `_warp_halo_pallas` does
    internally, hoisted so ONE transpose+pad serves every tier of a CF
    cascade call)."""
    spatial = moving.shape[1:-1]
    S0, S1, S2 = spatial
    taps = 2 * halo + 2
    s1p = _round_up(S1 + taps - 1, 8)
    s2p = _round_up(S2 + taps - 1, 128)
    mcf = jnp.transpose(moving.astype(jnp.float32), (0, 4, 1, 2, 3))
    return jnp.pad(mcf, ((0, 0), (0, 0), (halo, halo + 1),
                         (halo, s1p - S1 - halo), (halo, s2p - S2 - halo)))


def warp_cascaded_cf_image(moving: jnp.ndarray, dcf: jnp.ndarray,
                           spatial, doff: int = 0,
                           interpret: bool = False) -> jnp.ndarray:
    """Warp a channels-last image by a CF padded df through the CF
    cascade; returns channels-last (B_df, *spatial, C). For C=1 (the
    model's image warps) the output CF->CL transpose is a pure reshape.
    Inference path (no custom VJP): the CF decode routing is eval-only
    (models/pulpo.py); training keeps `warp_cascaded_grad`."""
    halos = halo_cascade()
    h = max(halos)
    mp = mov_to_cf(moving, h)
    out = warp_cascaded_cf(mp, dcf, spatial=spatial, c=moving.shape[-1],
                           b_mov=moving.shape[0], moff=h, doff=doff,
                           halos=halos, interpret=interpret)
    return jnp.transpose(out, (0, 2, 3, 4, 1)).astype(moving.dtype)


def warp_applicable(moving: jnp.ndarray, df: jnp.ndarray) -> bool:
    """Static eligibility for the halo kernel: TPU, 3D, same spatial
    shape for moving and df, compatible batches, big enough to beat the
    per-slab overhead, not disabled."""
    spatial = moving.shape[1:-1]
    return (
        jax.default_backend() == "tpu"
        and not _routing_get("PULPO_NO_PALLAS_WARP")
        and len(spatial) == 3
        and df.shape[-1] == 3
        and df.shape[1:-1] == spatial
        and df.shape[0] % moving.shape[0] == 0
        # the moving slab is DMA'd per grid step; many-channel inputs
        # (one-hot segmentations) would not fit VMEM at useful slab sizes
        and moving.shape[-1] <= 4
        and math.prod(spatial) >= MIN_HALO_VOXELS
        and all(s >= 2 * max(halo_cascade()) + 2 for s in spatial)
    )
