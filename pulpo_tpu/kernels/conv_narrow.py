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

Exact vs the XLA conv up to f32 summation order (tests/test_kernels.py
TestConvNarrowMXU, interpret mode — max diff 0.0 at f32).

**STATUS: interpret-validated prototype; BLOCKED on real Mosaic.** The
flattened-(y, x) layout makes z the second-minor (sublane-tiled) dim of
the HBM operand, and Mosaic requires DMA slices there to be 8-aligned —
the 3-slice z window is rejected ("Slice shape along dimension 2 must
be aligned to tiling (8), but is 3", measured v5e). The warp kernels
avoid this by keeping 5-D operands (z third-minor, untiled); this
kernel NEEDS the flat plane for its row-contiguous im2col copies. The
fix is a z-in-lanes transpose layout (taps' y/x shifts become unaligned
SUBLANE slices, z shifts become unaligned LANE slices, both legal;
8-aligned flat-block DMA starts) — a redesign left for round 4.
Routing stays opt-in (PULPO_CONV_NARROW=1) and OFF.

Constraints: 3D, kernel 3, SAME, stride 1, cin <= MAX_CIN, S2 + 2 <=
Wp = 128 (level-res shapes; full-res narrow convs keep XLA/tapgrad).
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


def _kernel(x_hbm, w_ref, b_ref, out_ref, xbuf, colbuf, sem, *,
            spatial, cin: int, cout: int, n_steps: int):
    """One (b, z) grid step: out[b, :, z] = conv(x)[b, :, z] (+ bias).

    x_hbm: (B, cin, S0 + 2, (S1 + 3) * WP) f32, zero ghost ring baked in
    (position (y, x) of z-slice s lives at flat (s + 1, (y+1)*WP + x+1);
    the extra trailing ghost row keeps every tap's contiguous slice
    in-bounds).
    w_ref: (27 * cin, cout) f32 in VMEM (tap-major, ci fastest — matches
    kernel.reshape(27*cin, cout)). b_ref: (1, cout) or zeros.
    out_ref block: (1, cout, 1, S1, S2).
    """
    b = pl.program_id(0)
    zi = pl.program_id(1)
    S0, S1, S2 = spatial
    flat_out = S1 * WP

    dma = pltpu.make_async_copy(
        x_hbm.at[b, :, pl.ds(zi, 3)], xbuf, sem)
    dma.start()
    dma.wait()

    # transposed im2col: one lane-contiguous row copy per (tap, ci)
    for dz in range(3):
        for dy in range(3):
            for dx in range(3):
                tap = (dz * 3 + dy) * 3 + dx
                off = dy * WP + dx
                for ci in range(cin):
                    colbuf[tap * cin + ci, :] = xbuf[ci, dz,
                                                     off:off + flat_out]

    # (27*cin, cout) x (27*cin, flat) -> (cout, flat) on the MXU
    acc = jax.lax.dot_general(
        w_ref[...], colbuf[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc = acc + b_ref[...][0][:, None]
    # lane dim flat = S1*WP splits tile-exactly into (S1, WP)
    out_ref[0, :, 0] = acc.reshape(cout, S1, WP)[:, :, :S2]


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

    # channels-first, zero ghost ring, flatten (y, x) with row pitch WP.
    # One EXTRA trailing ghost row: the (dy=2, dx=2) tap's contiguous
    # S1*WP-slice starts at 2*WP + 2 and would overrun (S1+2)*WP by 2
    # (the excess lanes are ghost positions the output never reads).
    xcf = jnp.transpose(x.astype(jnp.float32), (0, 4, 1, 2, 3))
    xp = jnp.pad(xcf, ((0, 0), (0, 0), (1, 1), (1, 2),
                       (1, WP - S2 - 1)))
    xf = xp.reshape(B, cin, S0 + 2, (S1 + 3) * WP)

    wf = kernel.astype(jnp.float32).reshape(27 * cin, cout)
    bf = (jnp.zeros((1, cout), jnp.float32) if bias is None
          else bias.astype(jnp.float32).reshape(1, cout))

    kern = functools.partial(_kernel, spatial=(S0, S1, S2), cin=cin,
                             cout=cout, n_steps=B * S0)
    out = pl.pallas_call(
        kern,
        grid=(B, S0),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(
            (1, cout, 1, S1, S2), lambda bi, zi: (bi, 0, zi, 0, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, cout, S0, S1, S2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((cin, 3, (S1 + 3) * WP), jnp.float32),
            pltpu.VMEM((27 * cin, S1 * WP), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xf, wf, bf)
    return jnp.transpose(out, (0, 2, 3, 4, 1)).astype(orig_dtype)


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
    level-res widths (S2 + 2 <= WP), big enough to amortize the grid.
    Opt-in via PULPO_CONV_NARROW=1 until hardware-validated."""
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
            and vol >= 32768 and spatial[0] >= 8)
