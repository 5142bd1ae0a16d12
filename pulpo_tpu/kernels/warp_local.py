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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def local_bound(spatial: tuple[int, ...]) -> float:
    """max|v| (voxels) below which the 27-tap stencil is exact."""
    return min(0.5 * (s - 1) / s for s in spatial)


def _pick_slab(d: int, target: int = 8) -> int:
    """Largest divisor of d that is <= target (static z-slab height)."""
    for c in range(min(d, target), 0, -1):
        if d % c == 0:
            return c
    return 1


def _step_kernel_3d(hbm_ref, out_ref, vbuf, sem, *, bz: int, spatial):
    """One (b, z-slab) grid step: out = vec + trilinear(vec, grid+vec)."""
    b = pl.program_id(0)
    zi = pl.program_id(1)
    S0, S1, S2 = spatial

    dma = pltpu.make_async_copy(
        hbm_ref.at[b, :, pl.ds(zi * bz, bz + 2)], vbuf, sem)
    dma.start()
    dma.wait()

    center = vbuf[:, 1:bz + 1, 1:S1 + 1, 1:S2 + 1]  # (3, bz, S1, S2)

    # absolute source coordinates, align_corners=False + border clamp
    shape = (bz, S1, S2)
    gz = jax.lax.broadcasted_iota(jnp.float32, shape, 0) + (zi * bz).astype(
        jnp.float32)
    gy = jax.lax.broadcasted_iota(jnp.float32, shape, 1)
    gx = jax.lax.broadcasted_iota(jnp.float32, shape, 2)
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
    out_ref[0] = jnp.stack(acc, axis=0)


def _step_kernel_2d(hbm_ref, out_ref, vbuf, sem, *, bz: int, spatial):
    b = pl.program_id(0)
    zi = pl.program_id(1)
    S0, S1 = spatial

    dma = pltpu.make_async_copy(
        hbm_ref.at[b, :, pl.ds(zi * bz, bz + 2)], vbuf, sem)
    dma.start()
    dma.wait()

    center = vbuf[:, 1:bz + 1, 1:S1 + 1]
    shape = (bz, S1)
    gz = jax.lax.broadcasted_iota(jnp.float32, shape, 0) + (zi * bz).astype(
        jnp.float32)
    gy = jax.lax.broadcasted_iota(jnp.float32, shape, 1)
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
            tap = vbuf[:, oz:oz + bz, oy:oy + S1]
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
    pad = ((0, 0), (0, 0)) + ((1, 1),) * ndims
    # zero padding is exact: the clamped source coordinate gives the
    # out-of-volume taps a hat weight of exactly 0
    vp = jnp.pad(vcf, pad)

    bz = _pick_slab(spatial[0])
    kern = _step_kernel_3d if ndims == 3 else _step_kernel_2d
    kern = functools.partial(kern, bz=bz, spatial=spatial)

    out_block = (1, ndims) + (bz,) + spatial[1:]
    out = pl.pallas_call(
        kern,
        grid=(b, spatial[0] // bz),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            out_block,
            lambda bi, zi: (bi, 0, zi) + (0,) * (ndims - 1),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, ndims, *spatial), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((ndims, bz + 2) + tuple(s + 2 for s in spatial[1:]),
                       jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(vp)

    inv = (0,) + tuple(range(2, ndims + 2)) + (1,)
    return jnp.transpose(out, inv).astype(orig_dtype)


def _squaring_step_xla(vec: jnp.ndarray) -> jnp.ndarray:
    from pulpo_tpu.ops.warp import warp_image

    return vec + warp_image(vec, vec)


@jax.custom_vjp
def squaring_step(vec: jnp.ndarray) -> jnp.ndarray:
    """One guarded scaling-and-squaring step: Pallas stencil when the
    field is sub-voxel (exactness bound), XLA gather otherwise."""
    bound = local_bound(vec.shape[1:-1])
    safe = jnp.max(jnp.abs(vec)) <= bound
    return jax.lax.cond(safe, _squaring_step_pallas, _squaring_step_xla, vec)


def _squaring_step_fwd(vec):
    return squaring_step(vec), vec


def _squaring_step_bwd(vec, g):
    # backward through the XLA composition (numerically identical path)
    _, vjp = jax.vjp(_squaring_step_xla, vec)
    return vjp(g)


squaring_step.defvjp(_squaring_step_fwd, _squaring_step_bwd)


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
