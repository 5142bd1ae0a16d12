"""Dense warping, SVF integration and vector-field resizing.

Replicates the reference registration primitives exactly
(src/network_blocks.py:88-177) in a channels-last, jit-friendly form:

- ``warp_image`` == SpatialTransformer: displacement is added to an
  ij-indexed identity grid, normalized with ``2*(loc/(size-1)-0.5)`` and
  sampled by ``F.grid_sample(mode='bilinear', padding_mode='border',
  align_corners=False)``. The composite coordinate mapping is
  ``src = clamp(loc * size/(size-1) - 0.5, 0, size-1)`` per axis
  (verified bit-for-bit vs torch in tests/test_warp.py). The reference's
  channel flip (network_blocks.py:113-117) only converts ij->xy for
  grid_sample; we sample in ij directly so no flip exists here.
- ``integrate_svf`` == VecInt: scaling & squaring with
  ``vec *= 1/2**nsteps`` then ``vec = vec + warp(vec, vec)`` repeated
  (network_blocks.py:160-177).
- ``resize_vecfield`` == ResizeTransform: resizes AND rescales a vector
  field, preserving the multiply/interpolate ordering of
  network_blocks.py:138-150.

Layout: images (B, *spatial, C); displacement fields (B, *spatial, ndims)
with channel i = displacement along spatial axis i in voxels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pulpo_tpu.ops.resize import resize_linear


def _source_coords(df: jnp.ndarray, in_spatial: tuple[int, ...]) -> list[jnp.ndarray]:
    """Per-axis absolute source coordinates (into an input of size
    `in_spatial`) for a displacement field defined on the *output* grid.

    Matches the reference SpatialTransformer + grid_sample composition:
    the grid is normalized by the transformer's (output) size while
    grid_sample unnormalizes by the *input* size — so warping an image of
    a different resolution than the df is well-defined (used by
    models.py:330 where full-res x is warped by level-res dfs):
      src = (g + df) / (S_out - 1) * S_in - 0.5,  clamped to [0, S_in-1].
    """
    out_spatial = df.shape[1:-1]
    ndims = len(out_spatial)
    coords = []
    for i in range(ndims):
        s_out, s_in = out_spatial[i], in_spatial[i]
        g = jax.lax.broadcasted_iota(jnp.float32, out_spatial, i)
        loc = g[None] + df[..., i].astype(jnp.float32)
        src = loc * (s_in / (s_out - 1)) - 0.5
        coords.append(jnp.clip(src, 0.0, s_in - 1))
    return coords


def warp_image(moving: jnp.ndarray, df: jnp.ndarray) -> jnp.ndarray:
    """Warp `moving` (B, *in_spatial, C) by `df` (B, *out_spatial, nd).

    Bilinear/trilinear, border padding, align_corners=False semantics.
    Output has the df's spatial shape; moving may have a different
    resolution (relative/normalized-coordinate warping, see
    _source_coords).

    TPU formulation: 2**nd corner gathers of FLAT 1-D per-channel
    arrays. A 1-D gather output has no minor-dim lane padding; any
    formulation that gathers multi-dim patches or (n, C) rows pads the
    trailing dim to the 128-lane tile (measured round 3: a single
    (M, 2,2,2, C=3) patch gather at full res allocates 28 GB — a 42x
    HBM blowup — because C=3 pads to 128 lanes; the same bytes as flat
    takes is 660 MB). The per-row scalar-core cost still makes XLA
    gathers the slow path on TPU — displacement-bounded warps route to
    the Pallas stencil kernels (kernels/warp_local.py) instead; this is
    the exact general fallback.
    """
    spatial = moving.shape[1:-1]
    ndims = len(spatial)
    assert df.shape[-1] == ndims, (
        f"df shape {df.shape} incompatible with moving {moving.shape}"
    )
    assert df.shape[0] % moving.shape[0] == 0, (
        f"df batch {df.shape[0]} not a multiple of moving batch "
        f"{moving.shape[0]}"
    )
    coords = _source_coords(df, spatial)

    i0, i1, w = [], [], []
    for c, size in zip(coords, spatial):
        f = jnp.floor(c)
        idx0 = f.astype(jnp.int32)
        idx1 = jnp.minimum(idx0 + 1, size - 1)
        i0.append(idx0)
        i1.append(idx1)
        w.append((c - f).astype(moving.dtype))

    b = moving.shape[0]
    c = moving.shape[-1]
    n_in = 1
    for s in spatial:
        n_in *= s
    out_spatial = df.shape[1:-1]
    n_out = 1
    for s in out_spatial:
        n_out *= s

    # strides for flattening input spatial indices
    strides = []
    acc = 1
    for s in reversed(spatial):
        strides.append(acc)
        acc *= s
    strides = strides[::-1]

    # Flat-1D gathers: a (B, n, C) row gather pads the tiny minor dims to
    # TPU tiles (measured 21x HBM expansion at C=3 -> OOM at full res).
    # Instead fold batch into a global flat index and gather from 1D
    # per-channel arrays (C small) or from (n, C) rows (C large, where
    # the C->lane padding is amortized).
    #
    # Sample-tiled broadcast: when df carries samples folded into its
    # batch axis ((S, B) flattened to S*B, pulpo.py n_samples) while
    # `moving` stays per-pair (B), row b' of df gathers from moving row
    # b' % B — no S-fold copy of the moving image ever materializes.
    b_df = df.shape[0]
    bidx = jax.lax.broadcasted_iota(jnp.int32, (b_df,) + (1,) * ndims, 0)
    if b_df != b:
        bidx = bidx % b
    batch_offset = bidx * n_in

    out = None
    # 2**ndims corner gathers, fused by XLA with the weight combine.
    for corner in range(2**ndims):
        idx = 0
        weight = None
        for ax in range(ndims):
            hi = (corner >> ax) & 1
            iax = i1[ax] if hi else i0[ax]
            wax = w[ax] if hi else (1.0 - w[ax])
            idx = idx + iax * strides[ax]
            weight = wax if weight is None else weight * wax
        gidx = (idx + batch_offset).reshape(-1)  # (B*n_out,)
        if c <= 8:
            chans = [
                jnp.take(moving[..., ci].reshape(-1), gidx, axis=0)
                for ci in range(c)
            ]
            g = jnp.stack(chans, axis=-1)  # (B*n_out, C)
        else:
            g = jnp.take(moving.reshape(-1, c), gidx, axis=0)
        contrib = g * weight.reshape(-1, 1)
        out = contrib if out is None else out + contrib
    return out.reshape(b_df, *out_spatial, c)


def warp_image_auto(moving: jnp.ndarray, df: jnp.ndarray) -> jnp.ndarray:
    """warp_image, routed through the Pallas halo-stencil warp on TPU
    for same-resolution 3D warps (kernels/warp_halo.py). The stencil
    is exact while every source offset stays within H voxels (runtime
    lax.cond guard; XLA gather fallback otherwise) — it turns the
    scalar-core per-voxel gathers of the hot per-sample full-res
    `transformed` warp (reference src/models.py:330) into vectorized
    VMEM taps. Cross-resolution warps (df_resolution='level_res'
    levels > 0) and 2D fall through to the gather path unchanged.
    """
    from pulpo_tpu.kernels.warp_halo import (
        warp_applicable,
        warp_cascaded_grad,
    )

    if warp_applicable(moving, df):
        return warp_cascaded_grad(moving, df)
    return warp_image(moving, df)


def batched_level_warp(moving: jnp.ndarray,
                       dfs: dict[int, jnp.ndarray]) -> dict[int, jnp.ndarray]:
    """Warp ONE moving image by every level's (same-shaped) df in a
    single call: the per-level dfs are stacked along the batch axis and
    fed to `warp_image_auto` as one sample-tiled warp (df batch = L x
    df-rows, moving batch unchanged; row r reads moving row r % B).

    At full_res df_resolution all K levels of the decode — and the
    mean-SVF tail — warp the same full-res image, so this turns K
    Pallas cascade launches (K tier branches, K fixed slab-DMA setups)
    into one. Exact: warping is independent per row, and every row's
    moving-image mapping is unchanged (tests/test_model.py).
    """
    levels = sorted(dfs)
    shapes = {dfs[l].shape for l in levels}
    assert len(shapes) == 1, f"batched_level_warp needs equal shapes, got {shapes}"
    stacked = jnp.concatenate([dfs[l] for l in levels], axis=0)
    warped = warp_image_auto(moving.astype(jnp.float32), stacked)
    per = dfs[levels[0]].shape[0]
    return {l: warped[i * per:(i + 1) * per] for i, l in enumerate(levels)}


# ---------------------------------------------------------------------------
# Channels-first df pipeline routing (round 5, PERF.md lever 1)
# ---------------------------------------------------------------------------


def cf_pipeline_active() -> bool:
    """Opt-in routing for the channels-first df pipeline: keep
    displacement fields in the Pallas kernels' native channels-first
    tile-padded layout between VecInt / cascade-warp calls so the
    per-call transpose+pad staging (~10.7 GB/chunk custom-call staging
    class, PERF.md round-3 HLO accounting) never materializes.
    PULPO_CF_PIPELINE=1 on TPU; =interpret forces the routing with
    interpret-mode kernels (CPU tests)."""
    from pulpo_tpu import routing

    mode = routing.get("PULPO_CF_PIPELINE")
    if mode == "interpret":
        return True
    if mode not in ("1", "integ"):
        return False
    import jax as _jax

    return (_jax.default_backend() == "tpu"
            and not routing.get("PULPO_NO_PALLAS_WARP"))


def cf_interpret() -> bool:
    from pulpo_tpu import routing

    return routing.get("PULPO_CF_PIPELINE") == "interpret"


def cf_fin_active() -> bool:
    """Full CF mode (final-df layout + batched CF warp + CF moments);
    =integ keeps only the chained CF integration (A/B bisect arm)."""
    from pulpo_tpu import routing

    return routing.get("PULPO_CF_PIPELINE") in ("1", "interpret")


def resize_vecfield_cf(
    x: jnp.ndarray, vel_resize: float, out_size: tuple[int, ...],
) -> jnp.ndarray:
    """`resize_vecfield` on an unpadded channels-first field
    (B, 3, *in_spatial), emitting the warp kernels' df layout
    (B, 3, S0, r8(S1), r128(S2)) with ZERO tile pads — the pads ride
    the y/x interpolation matrices as extra zero rows, so the padded
    output costs nothing beyond the resize itself. Same multiply/
    interpolate ordering as `resize_vecfield` (network_blocks.py:
    138-150); per-axis matrices and application order are identical,
    so interiors bit-match the channels-last path on CPU."""
    import numpy as np

    from pulpo_tpu.kernels.warp_local import _round_up
    from pulpo_tpu.ops.resize import _apply_axis_matrix, _linear_matrix

    factor = 1.0 / vel_resize
    in_sp = x.shape[2:]
    assert len(in_sp) == 3 and len(out_size) == 3
    S0, S1, S2 = out_size
    pads = (S0, _round_up(S1, 8), _round_up(S2, 128))

    if factor > 1:
        x = x * factor
    for i in range(3):
        m = _linear_matrix(in_sp[i], out_size[i], factor)
        if pads[i] != out_size[i]:
            m = np.concatenate(
                [m, np.zeros((pads[i] - out_size[i], in_sp[i]), np.float32)])
        if m.shape[0] == m.shape[1] and np.array_equal(m, np.eye(m.shape[0],
                                                                 dtype=m.dtype)):
            continue
        x = _apply_axis_matrix(x, m, 2 + i)
    if factor < 1:
        x = x * factor
    return x


def batched_level_warp_cf(moving: jnp.ndarray,
                          dfs_cf: dict[int, jnp.ndarray],
                          spatial: tuple[int, ...]) -> dict[int, jnp.ndarray]:
    """`batched_level_warp` with the per-level dfs already in the CF
    padded layout (doff=0, from `resize_vecfield_cf`): one CF cascade
    call for all K levels, zero df staging; the C=1 output transpose
    back to channels-last is a pure reshape."""
    from pulpo_tpu.kernels.warp_halo import warp_cascaded_cf_image

    levels = sorted(dfs_cf)
    shapes = {dfs_cf[l].shape for l in levels}
    assert len(shapes) == 1, f"batched_level_warp_cf needs equal shapes, got {shapes}"
    stacked = jnp.concatenate([dfs_cf[l] for l in levels], axis=0)
    warped = warp_cascaded_cf_image(moving.astype(jnp.float32), stacked,
                                    spatial, doff=0,
                                    interpret=cf_interpret())
    per = dfs_cf[levels[0]].shape[0]
    return {l: warped[i * per:(i + 1) * per] for i, l in enumerate(levels)}


def integrate_svf(vec: jnp.ndarray, nsteps: int = 7) -> jnp.ndarray:
    """Scaling-and-squaring integration of a stationary velocity field.

    vec: (B, *spatial, ndims). Matches VecInt (network_blocks.py:160-177):
    note the reference uses ``vec + warp(vec, vec)`` (not composition of
    the half-step with itself via phi o phi), which we reproduce.
    """
    assert nsteps >= 0
    vec = vec * (1.0 / (2**nsteps))
    for _ in range(nsteps):
        vec = vec + warp_image(vec, vec)
    return vec


def integrate_svf_auto(vec: jnp.ndarray, nsteps: int = 7,
                       allow_cf: bool = True) -> jnp.ndarray:
    """integrate_svf, routed through the Pallas halo-stencil kernel on
    TPU (kernels/warp_local.py: 1.8-2.3x faster at level-res shapes,
    with a runtime sub-voxel guard + XLA fallback for exactness).

    With the CF pipeline active (`cf_pipeline_active`) and `allow_cf`,
    the chained channels-first variant runs instead — one transpose+pad
    in, one transpose out, no XLA layout ops between the squaring
    steps. `allow_cf=False` keeps hot TRAINING paths on the
    channels-last chain, whose custom VJPs are the tuned backward
    (the CF chain's VJP is a correctness-net replay).

    Use only in non-vmapped contexts (deterministic predict, mean-SVF
    combine): under vmap the runtime guard's lax.cond lowers to a select
    that runs both branches. Set PULPO_NO_PALLAS_WARP=1 to disable.
    """
    from pulpo_tpu import routing

    if allow_cf and cf_pipeline_active():
        from pulpo_tpu.kernels.warp_local import (
            cf_chain_applicable,
            integrate_svf_cf,
        )

        if cf_chain_applicable(vec.shape[1:-1]):
            return integrate_svf_cf(vec, nsteps, cf_interpret())
    if (jax.default_backend() == "tpu"
            and not routing.get("PULPO_NO_PALLAS_WARP")):
        from pulpo_tpu.kernels.warp_local import integrate_svf_pallas

        return integrate_svf_pallas(vec, nsteps)
    return integrate_svf(vec, nsteps)


def resize_vecfield(
    x: jnp.ndarray,
    vel_resize: float,
    out_size: tuple[int, ...] | None = None,
) -> jnp.ndarray:
    """ResizeTransform: resize a vector field and rescale its magnitudes.

    factor = 1/vel_resize. factor < 1: interpolate then multiply;
    factor > 1: multiply then interpolate; factor == 1: identity
    (network_blocks.py:138-150). Output size defaults to
    floor(in * factor) per axis, matching F.interpolate(scale_factor=...).
    """
    factor = 1.0 / vel_resize
    spatial = x.shape[1:-1]
    if out_size is None:
        out_size = tuple(int(s * factor) for s in spatial)
    scales = tuple(factor for _ in spatial)
    if factor < 1:
        x = resize_linear(x, out_size, scales=scales)
        x = x * factor
    elif factor > 1:
        x = x * factor
        x = resize_linear(x, out_size, scales=scales)
    return x


def resize_dfs(
    dfs: dict[int, jnp.ndarray], target_size: tuple[int, ...] | None = None
) -> dict[int, jnp.ndarray]:
    """Resize a per-level dict of dfs to level-0's size (or a target).

    Reference helper src/components/utils.py:4-13 (whose `range(keys())`
    is a bug we fix by iterating the keys).
    """
    out = {}
    for l, df in dfs.items():
        ref_size = dfs[0].shape[1:-1] if target_size is None else tuple(target_size)
        vel_resize = 1.0 / (ref_size[0] / df.shape[1])
        out[l] = resize_vecfield(df, vel_resize, out_size=ref_size)
    return out


def warp_landmarks(lm: jnp.ndarray, df: jnp.ndarray) -> jnp.ndarray:
    """Warp landmarks by a displacement field.

    lm: (B, N, ndims) voxel coordinates (ij order). df: (B, *spatial,
    ndims). Matches the reference's integer-gather-and-subtract
    (src/components/utils.py:15-25 AND evaluate.py:410-424, which both
    do ``lm = lm.long()`` first): new_lm = trunc(lm) - df[:, :, z, y, x]
    — the TRUNCATED landmark is what the df is subtracted from, so the
    result loses the sub-voxel position exactly like the reference
    (verified by the eval-table parity harness, LM_MAE column).
    """
    b = lm.shape[0]
    lmi = lm.astype(jnp.int32)
    lm = lmi.astype(lm.dtype)
    spatial = df.shape[1:-1]
    ndims = len(spatial)
    strides = []
    acc = 1
    for s in reversed(spatial):
        strides.append(acc)
        acc *= s
    strides = strides[::-1]
    idx = sum(lmi[..., ax] * strides[ax] for ax in range(ndims))  # (B, N)
    flat = df.reshape(b, -1, ndims)
    sampled = jnp.take_along_axis(flat, idx[..., None], axis=1)  # (B, N, nd)
    return lm - sampled
