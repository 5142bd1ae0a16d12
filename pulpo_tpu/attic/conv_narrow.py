"""Pallas TPU kernel: narrow-input 3x3x3 conv on the MXU.

XLA computes cin<=8 convs (the VelocityField head's z->n0, reference
network_blocks.py:63-85) on the VECTOR unit — sensible, since
27*cin << the 128-lane MXU width — and probe_conv5 showed 17.7 ms for
3->32 at the l0 8-row shape is the VPU f32 ceiling (35.7 GFLOP at
~2 TF/s), unfixable by channel padding. This kernel reaches the MXU
instead: per (b, z) grid step it builds the TRANSPOSED im2col block

    col_T[tap*cin + ci, :] = slab[ci, dz, dy*Wp + dx :][: S1*Wp]

with 27*cin lane-contiguous VMEM row copies over a FLATTENED (y, x)
plane (ghost columns make x/y shifts plain offset slices; Wp = 128 so
the lane dim splits back into (S1, Wp) tile-exactly), then one

    dot_general((27*cin, Cout), (27*cin, S1*Wp))  ->  (Cout, S1*Wp)

MXU contraction per tap-block. Weights stay f32; accumulation is f32
(preferred_element_type) like the XLA conv.

Measured v5e at the l0 8-row shape: **9.8 ms vs XLA's 17.7 ms (1.8x)**,
bit-exact (max diff 0.0 at bf16 AND f32 — same f32 accumulation).

Hardware constraints that shaped the layout (each cost one failed
compile, scripts/probe_conv_narrow.py): the flat plane makes z the
second-minor SUBLANE-TILED dim of the HBM operand, and Mosaic requires
DMA slice starts AND shapes there to be 8-aligned — hence BZ = 8
output slices per grid step from a 16-slice window (in-kernel z
offsets are static unrolled); and a blocked (1, cout, 8, S1, S2)
output window would double-buffer ~12 MB at the l0 shape and blow the
16M scoped-VMEM limit — hence the output leaves through a small staged
buffer with a manual per-slice DMA (out in ANY memory, trailing
(S1, WP) dims tile-aligned).

Constraints: 3D, kernel 3, SAME, stride 1, cin <= MAX_CIN, S2 + 2 <=
WP = 128, S0 % 8 == 0 (level-res shapes; full-res narrow convs keep
XLA/tapgrad).

**Routing is OPT-IN (PULPO_CONV_NARROW=1) — composed, the full-res UQ
bench REGRESSES 2.9% with it on (A/B: 0.3503 vs 0.3605 pairs/s, both
reproduced twice)** despite the isolated 1.8x: the layout glue XLA
inserts around the custom call (channels-first transpose + flat-pad of
the input, transpose + slice of the padded output, and the lost fusion
of the sampling elementwise into the conv input read) costs more than
the ~8 ms/chunk the MXU saves. Same lesson as the split-merge hoist
and the im2col attempt: isolated op wins at this scale routinely lose
to XLA's composed-graph scheduling. A future version would need to
fuse the whole VelocityField head (conv+BN+LReLU+conv+1x1) in one
kernel so no layout boundary remains.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_CIN = 4
WP = 128  # flattened-plane row pitch (lane tile); needs S2 + 2 <= WP


BZ = 8  # output z-slices per grid step: the z dim is sublane-tiled in
# the flat layout, and Mosaic requires DMA slice starts AND shapes
# there to be 8-aligned — so steps start at multiples of 8 and DMA a
ZSLAB = 16  # 16-slice window covering the BZ + 2 slices actually read


def _kernel(x_hbm, w_ref, b_ref, out_hbm, xbuf, colbuf, obuf, sem, sem_o,
            *, spatial, cin: int, cout: int, n_steps: int):
    """One (b, z-octet) grid step: out[b, :, zi*BZ : zi*BZ+BZ] (+ bias).

    x_hbm: (B, cin, S0 + ZSLAB - BZ, (S1 + 3) * WP) in x's dtype, zero
    ghost ring baked in (position (y, x) of z-slice s lives at flat
    (s + 1, (y+1)*WP + x+1); the extra trailing ghost row keeps every
    tap's contiguous slice in-bounds, the extra z padding keeps every
    16-slice DMA window in-bounds).
    w_ref: (27 * cin, cout) in x's dtype, VMEM (tap-major, ci fastest —
    matches kernel.reshape(27*cin, cout)). b_ref: (1, cout) f32.
    out_hbm: (B, cout, S0, S1, WP) in ANY — a blocked (1, cout, BZ, S1,
    S2) out window would double-buffer ~12 MB at the l0 shape and blow
    Mosaic's 16M scoped-VMEM; instead each z-slice result is staged in
    a small obuf and DMA'd out (trailing (S1, WP) dims tile-aligned).
    """
    b = pl.program_id(0)
    zi = pl.program_id(1)
    S0, S1, S2 = spatial
    flat_out = S1 * WP

    dma = pltpu.make_async_copy(
        x_hbm.at[b, :, pl.ds(zi * BZ, ZSLAB)], xbuf, sem)
    dma.start()
    dma.wait()

    bias_col = b_ref[...][0][:, None]
    for lz in range(BZ):
        # transposed im2col: one lane-contiguous row copy per (tap, ci);
        # all slab indices are static (lz, dz unrolled)
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    tap = (dz * 3 + dy) * 3 + dx
                    off = dy * WP + dx
                    for ci in range(cin):
                        colbuf[tap * cin + ci, :] = xbuf[
                            ci, lz + dz, off:off + flat_out]

        # (27*cin, cout) x (27*cin, flat) -> (cout, flat) on the MXU,
        # f32 accumulation like the XLA conv
        acc = jax.lax.dot_general(
            w_ref[...], colbuf[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + bias_col
        # lane dim flat = S1*WP splits tile-exactly into (S1, WP)
        obuf[...] = acc.reshape(cout, S1, WP).astype(obuf.dtype)
        dma_o = pltpu.make_async_copy(
            obuf, out_hbm.at[b, :, zi * BZ + lz], sem_o)
        dma_o.start()
        dma_o.wait()


def conv3d_narrow_mxu(x: jnp.ndarray, kernel: jnp.ndarray,
                      bias: jnp.ndarray | None = None,
                      interpret: bool = False) -> jnp.ndarray:
    """SAME 3x3x3 conv via MXU im2col (see module docstring).

    x: (B, S0, S1, S2, cin) channels-last; kernel (3, 3, 3, cin, cout);
    bias (cout,) or None. Returns (B, S0, S1, S2, cout) in x's dtype.
    Callers check `narrow_applicable` first.
    """
    B, S0, S1, S2, cin = x.shape
    cout = kernel.shape[-1]
    assert kernel.shape == (3, 3, 3, cin, cout), kernel.shape
    assert S2 + 2 <= WP, (S2, WP)
    orig_dtype = x.dtype

    assert S0 % BZ == 0, (S0, BZ)
    # channels-first, zero ghost ring, flatten (y, x) with row pitch WP.
    # One EXTRA trailing ghost row: the (dy=2, dx=2) tap's contiguous
    # S1*WP-slice starts at 2*WP + 2 and would overrun (S1+2)*WP by 2
    # (the excess lanes are ghost positions the output never reads).
    # z pads to S0 + ZSLAB - BZ so the last step's 16-slice DMA window
    # ((S0/BZ - 1)*BZ .. +ZSLAB) stays in-bounds.
    xcf = jnp.transpose(x, (0, 4, 1, 2, 3))
    xp = jnp.pad(xcf, ((0, 0), (0, 0), (1, ZSLAB - BZ - 1), (1, 2),
                       (1, WP - S2 - 1)))
    xf = xp.reshape(B, cin, S0 + ZSLAB - BZ, (S1 + 3) * WP)

    wf = kernel.astype(orig_dtype).reshape(27 * cin, cout)
    bf = (jnp.zeros((1, cout), jnp.float32) if bias is None
          else bias.astype(jnp.float32).reshape(1, cout))

    kern = functools.partial(_kernel, spatial=(S0, S1, S2), cin=cin,
                             cout=cout, n_steps=B * S0)
    out = pl.pallas_call(
        kern,
        grid=(B, S0 // BZ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((B, cout, S0, S1, WP), orig_dtype),
        scratch_shapes=[
            pltpu.VMEM((cin, ZSLAB, (S1 + 3) * WP), orig_dtype),
            pltpu.VMEM((27 * cin, S1 * WP), orig_dtype),
            pltpu.VMEM((cout, S1, WP), orig_dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xf, wf, bf)
    return jnp.transpose(out[..., :S2], (0, 2, 3, 4, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3d_narrow(x: jnp.ndarray, kernel: jnp.ndarray,
                  interpret: bool = False) -> jnp.ndarray:
    """conv3d_narrow_mxu with the plain XLA conv VJP (the kernel is a
    forward/inference accelerator; training numerics unchanged —
    same pattern as ops/conv.py:conv3d_im2col)."""
    return conv3d_narrow_mxu(x, kernel, interpret=interpret)


def _narrow_fwd(x, kernel, interpret):
    return conv3d_narrow(x, kernel, interpret), (x, kernel)


def _narrow_bwd(interpret, res, g):
    from pulpo_tpu.ops.conv import _conv_xla

    x, kernel = res
    _, vjp = jax.vjp(_conv_xla, x, kernel)
    return tuple(vjp(g))


conv3d_narrow.defvjp(_narrow_fwd, _narrow_bwd)


def narrow_applicable(x: jnp.ndarray, kernel_size: int, padding) -> bool:
    """Static routing guard: TPU, 3D, 3x3x3 SAME, cin <= MAX_CIN,
    level-res widths (S2 + 2 <= WP), 8-divisible depth, big enough to
    amortize the grid. OPT-IN via PULPO_CONV_NARROW=1: composed, the
    flagship bench regresses 2.9% (module docstring)."""
    if os.environ.get("PULPO_CONV_NARROW") != "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    if x.ndim != 5 or kernel_size != 3 or padding != "SAME":
        return False
    spatial = x.shape[1:-1]
    vol = 1
    for s in spatial:
        vol *= s
    return (x.shape[-1] <= MAX_CIN and spatial[-1] + 2 <= WP
            and vol >= 32768 and spatial[0] >= 8
            and spatial[0] % BZ == 0)
