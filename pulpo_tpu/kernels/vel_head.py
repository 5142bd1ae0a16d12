"""Pallas TPU kernel: the WHOLE VelocityField head fused on the MXU.

The decode's velocity head (reference network_blocks.py:63-85, depth 3:
ConvUnit(zdim->n0) -> ConvUnit(n0->n0) -> 1x1 Conv(n0->ndims), each
ConvUnit = conv3x3x3 + eval-mode BatchNorm + LeakyReLU(0.2)) is the one
hot block where XLA's per-op costs are dominated by glue, not math
(PERF.md):

- the zdim->n0 conv runs on the VPU at its ~2 TF/s f32 ceiling
  (27*zdim << the 128-lane MXU width) — 17.7 ms at the l0 8-row shape;
- the single-op MXU fix (attic/conv_narrow.py) is 1.8x isolated but
  LOSES 2.9% composed: its 32-channel custom-call output forces a
  materialized channels-first->last transpose (~2.6 GB/chunk of
  transpose passes ~ 20 ms);
- the n0->n0 conv runs at 14.3 TF/s (the 128-lane emitter pathology).

This kernel fuses the head end-to-end so BOTH custom-call seams sit on
ndims(=3)-channel tensors (~25 MB/chunk of transpose+pad, negligible)
and every intermediate stays in VMEM:

    grid step (b, z-octet):  DMA a 16-slice flat ghosted input window,
    then per output slice z (rolling 3-plane conv1 ring, channels-first):
      conv1: transposed im2col (27*zdim row copies over the flattened
             (y, x) plane) + ONE (27*zdim, n0)x(27*zdim, S1*WP) MXU dot
      epilogue: +bias (dt) -> eval-BN affine (f32, flax order) ->
             LeakyReLU (dt) -> mask ghost lanes -> ring store
      conv2: 27 per-tap (n0, n0)x(n0, S1*WP) MXU dots over ghosted ring
             slices (dy via WP-aligned offsets, dx via lane offsets)
      epilogue 2, then the 1x1 head: (ndims, n0)x(n0, S1*WP) dot + bias,
      staged per-slice DMA out (same scheme as conv_narrow).

Numerics mirror the flax/XLA composition op-for-op: convs accumulate
f32 on the MXU and round to the compute dtype before the bias add;
eval BatchNorm computes (f32(x) - mean) * (rsqrt(var + eps) * scale)
+ bias in f32 (flax normalization.py _normalize with running stats)
then casts; LeakyReLU runs in the compute dtype. Interpret-mode tests
pin equality against the unfused flax path at bf16 and f32.

Layout facts inherited from conv_narrow.py (each cost a failed compile
there): the flat (y, x) plane makes z the sublane-tiled dim of the HBM
operand, so DMA windows start 8-aligned with 8-aligned shapes (grid
steps cover BZ=8 output slices from a 16-slice window); SAME-pad ghost
ring baked into the flat layout ((y, x) of slice s at flat
(s + 2, (y+1)*WP + x + 1), one extra trailing ghost row so every tap's
contiguous slice stays in-bounds); blocked multi-slice output windows
double-buffer past Mosaic's 16M scoped VMEM, so outputs leave through a
per-slice staged DMA.

Routing is wired in models/blocks.VelocityField (eval only — BN batch
stats rule out training) and controlled by PULPO_FUSED_VELHEAD:
unset = ON for bf16 compute at l0-scale volumes (the round-4 composed
flagship A/B won, reproduced: see vel_head_mode), "1" = on wherever
applicable (incl. f32), "0" = off, "interp" = CPU interpret test hook.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_ZDIM = 4
WP = 128  # flattened-plane row pitch (lane tile); needs S2 + 2 <= WP
BZ = 8    # output z-slices per grid step (8-aligned DMA windows)
ZSLAB = 16


from pulpo_tpu.kernels.activations import leaky as _leaky
from pulpo_tpu.kernels.activations import leaky_from_f32 as _leaky_f32


def _kernel(x_hbm, w1_ref, w2_ref, w3_ref, bb_ref, bn_ref, out_hbm,
            xbuf, colbuf, ring, obuf, sem, sem_o,
            *, spatial, zdim: int, n0: int, ndims: int):
    """One (b, z-octet) grid step: out[b, :, zi*BZ : zi*BZ + BZ].

    x_hbm: (B, zdim, S0 + 8, (S1 + 3) * WP), slice s at z-index s + 2
    (front ghost 2 so the 8-aligned window [zi*8, zi*8+16) covers the
    conv-depth-2 halo [zi*8-2, zi*8+10)).
    w1_ref: (27 * zdim, n0) dt. w2_ref: (27, n0, n0) dt, w2_ref[tap] =
    kernel[tap].T (out, in). w3_ref: (ndims, n0) dt.
    bb_ref: (3, n0) f32, values pre-rounded to dt — conv biases b1, b2,
    b3 (b3 zero-padded); the in-kernel .astype(dt) recovers the exact
    XLA bias (hardware Mosaic rejects non-32-bit minor-dim reshapes).
    bn_ref: (6, n0) f32 — mean1, rsqrt(var1+eps)*scale1, bias1, then
    the same for BN2 (the flax eval-BN affine, precomputed outside).
    ring: (3, n0, (S1 + 3) * WP) dt — rolling conv1-activation planes in
    the same ghosted flat layout as the input ((y, x) at (y+1)*WP+x+1),
    so conv2's tap reads are the same offset slices conv1 uses.
    """
    b = pl.program_id(0)
    zi = pl.program_id(1)
    S0, S1, S2 = spatial
    flat = S1 * WP
    dt = xbuf.dtype

    dma = pltpu.make_async_copy(
        x_hbm.at[b, :, pl.ds(zi * BZ, ZSLAB)], xbuf, sem)
    dma.start()
    dma.wait()

    # ghost rows of all three ring slots: zero once per step (interior
    # rows are fully overwritten per slice; scratch persists across steps)
    zlead = jnp.zeros((n0, WP), dt)
    ztail = jnp.zeros((n0, 2 * WP), dt)
    for idx in range(3):
        ring[idx, :, 0:WP] = zlead
        ring[idx, :, (S1 + 1) * WP:(S1 + 3) * WP] = ztail

    def conv1_slice(j: int):
        """conv1 + epilogue for global slice t = zi*BZ + j -> ring slot
        (j + 1) % 3. t's input halo sits at window idx j+1 .. j+3."""
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    tap = (dz * 3 + dy) * 3 + dx
                    off = dy * WP + dx
                    for ci in range(zdim):
                        colbuf[tap * zdim + ci, :] = xbuf[
                            ci, j + 1 + dz, off:off + flat]
        acc = jax.lax.dot_general(
            w1_ref[...], colbuf[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # XLA conv rounds its f32 accumulation to dt BEFORE the bias add
        a = acc.astype(dt) + bb_ref[0][:, None].astype(dt)
        y = ((a.astype(jnp.float32) - bn_ref[0][:, None])
             * bn_ref[1][:, None] + bn_ref[2][:, None])
        a = _leaky_f32(y, dt)
        # zero SAME-pad ghosts: lanes x >= S2, and whole planes at
        # t == -1 / t == S0 (conv2 must read zeros there)
        t = zi * BZ + j
        valid = jnp.logical_and(t >= 0, t < S0)
        a3 = a.reshape(n0, S1, WP)
        lane_ok = jax.lax.broadcasted_iota(jnp.int32, (n0, S1, WP), 2) < S2
        a3 = jnp.where(jnp.logical_and(lane_ok, valid), a3,
                       jnp.zeros((), dt))
        # roll right 1 lane: interior x lands at lane x+1 (the ghosted
        # flat convention); the wrapped-in lane is a masked-zero ghost
        # hardware Mosaic implements tpu.dynamic_rotate only for 32-bit
        # lanes: roll in f32 and round back (exact — bf16 -> f32 -> bf16
        # is the identity on bf16 values)
        ring[(j + 1) % 3, :, WP:WP + flat] = pltpu.roll(
            a3.reshape(n0, flat).astype(jnp.float32), 1, axis=1).astype(dt)

    def conv2_slice(k: int):
        """conv2 + epilogue + 1x1 head for out slice zi*BZ + k; conv1
        planes k-1, k, k+1 sit in ring slots k%3, (k+1)%3, (k+2)%3."""
        acc = None
        for dz in range(3):
            slot = (k + dz) % 3
            for dy in range(3):
                for dx in range(3):
                    tap = (dz * 3 + dy) * 3 + dx
                    off = dy * WP + dx
                    sl = ring[slot, :, off:off + flat]
                    d = jax.lax.dot_general(
                        w2_ref[tap], sl, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc = d if acc is None else acc + d
        a = acc.astype(dt) + bb_ref[1][:, None].astype(dt)
        y = ((a.astype(jnp.float32) - bn_ref[3][:, None])
             * bn_ref[4][:, None] + bn_ref[5][:, None])
        a = _leaky_f32(y, dt)
        out = jax.lax.dot_general(
            w3_ref[...], a, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        out = out.astype(dt) + bb_ref[2][:ndims][:, None].astype(dt)
        obuf[...] = out.reshape(ndims, S1, WP)
        dma_o = pltpu.make_async_copy(
            obuf, out_hbm.at[b, :, zi * BZ + k], sem_o)
        dma_o.start()
        dma_o.wait()

    conv1_slice(-1)
    conv1_slice(0)
    for k in range(BZ):
        conv1_slice(k + 1)
        conv2_slice(k)


def velocity_head_fused(z: jnp.ndarray, p: dict,
                        interpret: bool = False) -> jnp.ndarray:
    """Fused depth-3 VelocityField head (module docstring).

    z: (B, S0, S1, S2, zdim) channels-last; p: the head's parameters —
    k1 (3,3,3,zdim,n0), b1 (n0,), BN1 mean1/var1/scale1/bias1 (n0,) f32,
    k2 (3,3,3,n0,n0), b2, BN2 likewise, k3 (1,1,1,n0,ndims), b3 (ndims,).
    Callers check `vel_head_applicable` first.
    """
    B, S0, S1, S2, zdim = z.shape
    n0 = p["k1"].shape[-1]
    ndims = p["k3"].shape[-1]
    dt = z.dtype
    assert p["k1"].shape == (3, 3, 3, zdim, n0), p["k1"].shape
    assert p["k2"].shape == (3, 3, 3, n0, n0), p["k2"].shape
    assert p["k3"].shape == (1, 1, 1, n0, ndims), p["k3"].shape
    assert S2 + 2 <= WP and S0 % BZ == 0, (S0, S2)

    # channels-first, flat ghosted (y, x) planes, slice s at z-index s+2
    xcf = jnp.transpose(z, (0, 4, 1, 2, 3))
    xp = jnp.pad(xcf, ((0, 0), (0, 0), (2, 6), (1, 2), (1, WP - S2 - 1)))
    xf = xp.reshape(B, zdim, S0 + 8, (S1 + 3) * WP)

    w1 = p["k1"].astype(dt).reshape(27 * zdim, n0)
    w2 = jnp.transpose(p["k2"].astype(dt).reshape(27, n0, n0), (0, 2, 1))
    w3 = p["k3"].astype(dt).reshape(n0, ndims).T
    # biases ride as f32 rows (values pre-rounded to dt, so the
    # in-kernel .astype(dt) recovers the exact XLA bias): hardware
    # Mosaic rejects the (n,) -> (n, 1) minor-dim reshape for non-32-bit
    # types, so the [:, None] must happen on an f32 vector
    bb = jnp.stack([
        p["b1"].astype(dt),
        p["b2"].astype(dt),
        jnp.pad(p["b3"].astype(dt), (0, n0 - ndims)),
    ]).astype(jnp.float32)
    eps = jnp.float32(1e-5)

    def aff(m, v, s, b):
        # the flax eval-BN affine: mul = rsqrt(var + eps); mul *= scale
        return [m.astype(jnp.float32),
                jax.lax.rsqrt(v.astype(jnp.float32) + eps)
                * s.astype(jnp.float32),
                b.astype(jnp.float32)]

    bn = jnp.stack(aff(p["mean1"], p["var1"], p["scale1"], p["bias1"])
                   + aff(p["mean2"], p["var2"], p["scale2"], p["bias2"]))

    kern = functools.partial(_kernel, spatial=(S0, S1, S2), zdim=zdim,
                             n0=n0, ndims=ndims)
    out = pl.pallas_call(
        kern,
        grid=(B, S0 // BZ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, ndims, S0, S1, WP), dt),
        scratch_shapes=[
            pltpu.VMEM((zdim, ZSLAB, (S1 + 3) * WP), dt),
            pltpu.VMEM((27 * zdim, S1 * WP), dt),
            pltpu.VMEM((3, n0, (S1 + 3) * WP), dt),
            pltpu.VMEM((ndims, S1, WP), dt),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        # the default 16M scoped-VMEM stack is 144K short of this
        # kernel's l0 live set (hardware Mosaic, round 4); the limit is
        # a compiler default, not physical — total VMEM is 128M and
        # scratch+stack+operands stay well under it at 48M
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=48 * 1024 * 1024),
        interpret=interpret,
    )(xf, w1, w2, w3, bb, bn)
    return jnp.transpose(out[..., :S2], (0, 2, 3, 4, 1))


def velocity_head_xla(z: jnp.ndarray, p: dict) -> jnp.ndarray:
    """The unfused reference composition (exactly what the flax
    VelocityField computes at eval, models/blocks.py:238-261): used for
    the interpret-mode golden tests and as the custom-VJP backward."""
    from pulpo_tpu.ops.conv import _conv_xla

    dt = z.dtype
    eps = jnp.float32(1e-5)

    def bn_eval(x, m, v, s, b):
        mul = jax.lax.rsqrt(v.astype(jnp.float32) + eps) * s
        y = (x - m) * mul + b  # promotes to f32 (running stats are f32)
        return y.astype(dt)

    x = _conv_xla(z, p["k1"].astype(dt)) + p["b1"].astype(dt)
    x = _leaky(bn_eval(x, p["mean1"], p["var1"], p["scale1"], p["bias1"]), dt)
    x = _conv_xla(x, p["k2"].astype(dt)) + p["b2"].astype(dt)
    x = _leaky(bn_eval(x, p["mean2"], p["var2"], p["scale2"], p["bias2"]), dt)
    return _conv_xla(x, p["k3"].astype(dt)) + p["b3"].astype(dt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def velocity_head(z: jnp.ndarray, p: dict,
                  interpret: bool = False) -> jnp.ndarray:
    """velocity_head_fused with the XLA-composition VJP (the kernel is
    an inference accelerator; the eval path never differentiates, but an
    accidental grad must not crash — same pattern as conv_narrow)."""
    return velocity_head_fused(z, p, interpret=interpret)


def _vh_fwd(z, p, interpret):
    return velocity_head(z, p, interpret), (z, p)


def _vh_bwd(interpret, res, g):
    z, p = res
    _, vjp = jax.vjp(velocity_head_xla, z, p)
    return tuple(vjp(g))


velocity_head.defvjp(_vh_fwd, _vh_bwd)


def vel_head_mode(z: jnp.ndarray, n0: int, ndims: int) -> str | None:
    """Routing guard for models/blocks.VelocityField: returns None (use
    XLA), "tpu", or "interp" (CPU interpret-mode test hook). Applies at
    l0-scale volumes (the vol floor below) — l1 loses isolated (0.83x),
    l2/l3 are too small/unaligned; all keep XLA.

    DEFAULT ON (bf16 compute only) since round 4: isolated 1.78x at l0
    (19.96 vs 35.50 ms) AND a reproduced composed full-bench win —
    0.3632/0.3634 pairs/s (min-call 10.48 s, runs 100 min apart) vs
    interleaved baselines 0.3603/0.3602 (10.58/10.59 s): +0.9%, small
    but stable while the same ladder measured posthead at -6% (PERF.md
    round-4 ladder). The default is bf16-gated so the f32 parity
    harness (scripts/parity_fullres.py) keeps the bit-clean XLA
    composition; explicit PULPO_FUSED_VELHEAD=1 routes f32 too.
    PULPO_FUSED_VELHEAD=0 disables."""
    from pulpo_tpu import routing

    flag = routing.get("PULPO_FUSED_VELHEAD")
    if flag == "" and z.dtype == jnp.bfloat16:
        flag = "1"
    elif flag == "":
        flag = "0"
    if flag == "0":
        return None
    if ndims != 3 or z.ndim != 5 or z.shape[-1] > MAX_ZDIM or n0 > 64:
        return None
    if z.dtype not in (jnp.bfloat16, jnp.float32):
        return None
    S0, S1, S2 = z.shape[1:-1]
    vol = S0 * S1 * S2
    # hardware A/B (probe_vel_head, v5e, round 4): 1.78x at the l0
    # shape (80x96x112, 19.96 vs 35.50 ms) but 0.83x at l1 (40x48x56,
    # 7.54 vs 6.26 ms) — the per-grid-step fixed overhead dominates at
    # small volumes. Floor set between the two.
    if not (S2 + 2 <= WP and S0 % BZ == 0 and S0 >= BZ and vol >= 400_000):
        return None
    if flag == "interp":
        return "interp"
    return "tpu" if jax.default_backend() == "tpu" else None
