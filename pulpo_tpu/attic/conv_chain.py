"""ATTIC (round 5): unproven-by-design -> retired from the hot tree.

Hardware-validated exact (~1 ulp bf16) but never composed-A/B'd, and
its target (the encode ConvSequences) is ~1.7% of the UQ call. Every
same-class custom-call fusion lost composed (6x by round 5: narrow
conv -2.9%, pos_head -6.0%, coarse-tier compile-in -12.9%, CF full
-1.8%, hoisting -11%); the expected value of one more 25-min relay
A/B on a 1.7% target did not clear the bar (VERDICT r4 #7: "expectation
is attic; what matters is ending the unproven state"). Kept importable
with its tests; PULPO_FUSED_CONVSEQ routing now points here.

Pallas TPU kernel: a fused plain ConvSequence (conv+BN+LReLU chain).

Generalizes the whole-head fusion pattern of kernels/pos_head.py to any
unbranched ConvSequence (models/blocks.py: `depth` chained ConvUnits,
each conv3x3x3 + eval BatchNorm + LeakyReLU(0.2)) with no split/merge
operands. Primary target: the encoder's full-res `down_block_0`
(2 -> n0 -> n0 -> n0, reference pulpo.py:29-33) — XLA runs its
narrow-channel convs at 1.6-9.7 TF/s on v5e (PERF.md conv table: the
2->32 conv is VPU-bound, 32->32 hits the narrow-lane emitter), making
the encode ~0.35 s of a 10.4 s flagship UQ call. The fused chain keeps
every intermediate in VMEM; the only seams are the cin(<=8)-channel
input and one cout-channel output.

Structure (pos_head.py, module docstring, with a parameterized stage
list): per (row, z-octet) grid step, DMA a 16-slice ghosted flat input
window; run a depth-D conv pipeline one z-slice per stage per
iteration — stage 1 via transposed im2col (27 block copies + one
(27*cin, c1) MXU dot), stages 2..D via 27 per-tap (cout, cin) MXU dots
over ghosted ring planes; BN+LReLU epilogues between; per-slice staged
output DMA. Ring buffers (4 slots, static indices) persist across grid
steps so the pipeline warmup runs once per row. The flat-plane row
pitch WP is a parameter (128 at level res, 256 at full res where
S2 + 2 > 128).

Numerics mirror the flax/XLA eval composition op-for-op (the
pos_head.py contract): f32 MXU accumulation rounded to the compute
dtype before the bias add; eval BN in f32; LReLU in the compute dtype.
Routing is wired in models/blocks.ConvSequence (eval only, plain calls
only — split/hoisted merges keep their own paths) behind
PULPO_FUSED_CONVSEQ: "1" = on where applicable, unset/"0" = off,
"interp" = CPU interpret test hook. OPT-IN until the composed flagship
A/B lands (round-3 rule).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_CIN = 8     # im2col colbuf budget; down_block_0 has cin = 2
MAX_DEPTH = 4   # ghost budget: G = depth <= 4 fits the 16-slice window
BZ = 8
ZSLAB = 16
NRING = 4


from pulpo_tpu.kernels.activations import leaky as _leaky
from pulpo_tpu.kernels.activations import leaky_from_f32 as _leaky_f32


def _kernel(x_hbm, *refs, spatial, widths, wp: int):
    """One (row, z-octet) grid step of the depth-D chain.

    refs: D weight refs (w1 (27*c0, c1); wi (27, c_i, c_{i-1}) tap-
    transposed), D bias refs (1, c_i), D BN refs (3, c_i) f32, the
    output ref, then scratch: xbuf, colbuf, D-1 rings, obuf, 2 sems.
    widths: (c0, c1, ..., cD). Ghost depth G = D.
    """
    D = len(widths) - 1
    ws = refs[:D]
    bs = refs[D:2 * D]
    bns = refs[2 * D:3 * D]
    out_hbm = refs[3 * D]
    xbuf = refs[3 * D + 1]
    colbuf = refs[3 * D + 2]
    rings = refs[3 * D + 3:3 * D + 3 + (D - 1)]
    obuf = refs[3 * D + 3 + (D - 1)]
    sem_x, sem_o = refs[3 * D + 4 + (D - 1):]

    r = pl.program_id(0)
    zi = pl.program_id(1)
    S0, S1, S2 = spatial
    flat = S1 * wp
    dt = xbuf.dtype
    t0 = zi * BZ
    G = D

    dma = pltpu.make_async_copy(
        x_hbm.at[r, :, pl.ds(zi * BZ, ZSLAB)], xbuf, sem_x)
    dma.start()
    dma.wait()

    lane_ok = jax.lax.broadcasted_iota(jnp.int32, (S1, wp), 1) < S2

    def ghosted_store(ring, slot: int, a, t):
        n = a.shape[0]
        valid = jnp.logical_and(t >= 0, t < S0)
        a3 = a.reshape(n, S1, wp)
        a3 = jnp.where(jnp.logical_and(lane_ok[None], valid), a3,
                       jnp.zeros((), dt))
        # hardware Mosaic implements tpu.dynamic_rotate only for 32-bit
        # lanes: roll in f32 and round back (exact for bf16 values)
        ring[slot, :, wp:wp + flat] = pltpu.roll(
            a3.reshape(n, flat).astype(jnp.float32), 1, axis=1).astype(dt)

    def epilogue(acc, i):
        a = acc.astype(dt) + bs[i][0][:, None].astype(dt)
        y = ((a.astype(jnp.float32) - bns[i][0][:, None])
             * bns[i][1][:, None] + bns[i][2][:, None])
        return _leaky_f32(y, dt)

    c0 = widths[0]

    def stage_slice(i: int, j: int):
        """Stage i (0-based) at slice t = t0 + j."""
        if i == 0:
            for dz in range(3):
                for dy in range(3):
                    for dx in range(3):
                        tap = (dz * 3 + dy) * 3 + dx
                        off = dy * wp + dx
                        colbuf[tap * c0:(tap + 1) * c0, :] = xbuf[
                            :, j + G - 1 + dz, off:off + flat]
            acc = jax.lax.dot_general(
                ws[0][...], colbuf[...], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            # dz as a fori_loop (slot/tap become traced LEADING-dim
            # indices — legal, unlike sublane/lane dims): 9 dots live
            # per iteration instead of 27, cutting Mosaic program size
            # and scoped-stack high-water; summation order unchanged
            # (dz-major either way) -> bit-identical (same restructure
            # as pos_head.tap_conv, round 4)
            ring_i = rings[i - 1]
            n_out = ws[i].shape[1]

            def dz_body(dz, acc, _i=i, _j=j, _ring=ring_i):
                slot = jax.lax.rem(_j - 1 + dz + NRING, NRING)
                for dy in range(3):
                    for dx in range(3):
                        tap = (dz * 3 + dy) * 3 + dx
                        off = dy * wp + dx
                        d = jax.lax.dot_general(
                            ws[_i][tap], _ring[slot, :, off:off + flat],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        acc = acc + d
                return acc

            acc = jax.lax.fori_loop(
                0, 3, dz_body, jnp.zeros((n_out, flat), jnp.float32))
        a = epilogue(acc, i)
        if i == D - 1:
            obuf[...] = a.reshape(widths[-1], S1, wp)
            dma_o = pltpu.make_async_copy(
                obuf, out_hbm.at[r, :, t0 + j], sem_o)
            dma_o.start()
            dma_o.wait()
        else:
            ghosted_store(rings[i], j % NRING, a, t0 + j)

    @pl.when(zi == 0)
    def _warmup():
        for ring, n in zip(rings, widths[1:-1]):
            zlead = jnp.zeros((n, wp), dt)
            ztail = jnp.zeros((n, 2 * wp), dt)
            for s in range(NRING):
                ring[s, :, 0:wp] = zlead
                ring[s, :, (S1 + 1) * wp:(S1 + 3) * wp] = ztail
        # stage-0 ring needs its t = -1 zero plane FIRST (stage 1 reads
        # it at t = 0; no warmup stage ever writes it — stage 0 runs
        # only at j >= 0)
        ghosted_store(rings[0], (-1) % NRING,
                      jnp.zeros((widths[1], flat), dt), jnp.int32(0))
        # pipeline warmup: steady-state iterations at k = -(D-1)..-1;
        # intermediate stages at negative t write zero planes (SAME
        # padding); the output stage at negative t is skipped
        for k in range(-(D - 1), 0):
            for i in range(D):
                j = k + (D - 1 - i)
                t = j  # t0 == 0
                if i == D - 1 and t < 0:
                    continue  # no output for negative slices
                if t < 0:
                    ghosted_store(rings[i], t % NRING,
                                  jnp.zeros((widths[i + 1], flat), dt),
                                  jnp.int32(0))
                else:
                    stage_slice(i, j)

    for k in range(BZ):
        for i in range(D):
            stage_slice(i, k + (D - 1 - i))


def conv_chain_fused(x: jnp.ndarray, stages: list[dict], wp: int = 128,
                     interpret: bool = False) -> jnp.ndarray:
    """Fused depth-D ConvSequence (module docstring).

    x: (R, S0, S1, S2, cin) channels-last. stages: one dict per
    ConvUnit — k (3,3,3,cin_i,cout_i), b (cout_i,), mean/var/scale/bias
    (cout_i,) eval-BN stats. Callers check `conv_chain_mode` first.
    """
    R, S0, S1, S2, cin = x.shape
    D = len(stages)
    widths = (cin,) + tuple(s["k"].shape[-1] for s in stages)
    for i, s in enumerate(stages):
        assert s["k"].shape == (3, 3, 3, widths[i], widths[i + 1]), (
            i, s["k"].shape, widths)
    dt = x.dtype
    assert S2 + 2 <= wp and wp % 128 == 0 and S0 % BZ == 0, (S0, S2, wp)
    assert 2 <= D <= MAX_DEPTH and cin <= MAX_CIN, (D, cin)
    G = D

    xcf = jnp.transpose(x, (0, 4, 1, 2, 3))
    xp = jnp.pad(xcf, ((0, 0), (0, 0), (G, 8 - G),
                       (1, 2), (1, wp - S2 - 1)))
    xf = xp.reshape(R, cin, S0 + 8, (S1 + 3) * wp)

    w_ops = [stages[0]["k"].astype(dt).reshape(27 * cin, widths[1])]
    for i in range(1, D):
        w_ops.append(jnp.transpose(
            stages[i]["k"].astype(dt).reshape(27, widths[i], widths[i + 1]),
            (0, 2, 1)))
    # f32 rows, values pre-rounded to dt (hardware Mosaic rejects the
    # in-kernel (n,) -> (n, 1) reshape for non-32-bit types)
    b_ops = [s["b"].astype(dt).astype(jnp.float32)[None] for s in stages]
    eps = jnp.float32(1e-5)
    bn_ops = [
        jnp.stack([
            s["mean"].astype(jnp.float32),
            jax.lax.rsqrt(s["var"].astype(jnp.float32) + eps)
            * s["scale"].astype(jnp.float32),
            s["bias"].astype(jnp.float32),
        ])
        for s in stages
    ]

    kern = functools.partial(_kernel, spatial=(S0, S1, S2), widths=widths,
                             wp=wp)
    ghost_flat = (S1 + 3) * wp
    out = pl.pallas_call(
        kern,
        grid=(R, S0 // BZ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 * D),
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((R, widths[-1], S0, S1, wp), dt),
        scratch_shapes=[
            pltpu.VMEM((cin, ZSLAB, ghost_flat), dt),
            pltpu.VMEM((27 * cin, S1 * wp), dt),
        ] + [
            pltpu.VMEM((NRING, widths[i + 1], ghost_flat), dt)
            for i in range(D - 1)
        ] + [
            pltpu.VMEM((widths[-1], S1, wp), dt),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        # lift the 16M scoped-VMEM default (compiler default, not
        # physical). NOT higher than 76M: the limit doubles as the
        # stack budget the scheduler feels free to use — pos_head at a
        # 100M cap scheduled a ~97M high-water and blew the 128M
        # physical VMEM (round-4 probe); same rationale as pos_head.py.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=76 * 1024 * 1024),
        interpret=interpret,
    )(xf, *w_ops, *b_ops, *bn_ops)
    return jnp.transpose(out[..., :S2], (0, 2, 3, 4, 1))


def conv_chain_xla(x: jnp.ndarray, stages: list[dict]) -> jnp.ndarray:
    """The unfused reference composition (what ConvSequence computes at
    eval): interpret-mode golden oracle and the custom-VJP backward."""
    from pulpo_tpu.ops.conv import _conv_xla

    dt = x.dtype
    eps = jnp.float32(1e-5)
    for s in stages:
        x = _conv_xla(x, s["k"].astype(dt)) + s["b"].astype(dt)
        mul = (jax.lax.rsqrt(s["var"].astype(jnp.float32) + eps)
               * s["scale"])
        x = ((x - s["mean"]) * mul + s["bias"]).astype(dt)
        x = _leaky(x, dt)
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv_chain(x: jnp.ndarray, stages: list[dict], wp: int = 128,
               interpret: bool = False) -> jnp.ndarray:
    """conv_chain_fused with the XLA-composition VJP (inference
    accelerator; an accidental grad must not crash — the vel_head /
    pos_head pattern)."""
    return conv_chain_fused(x, stages, wp=wp, interpret=interpret)


def _cc_fwd(x, stages, wp, interpret):
    return conv_chain(x, stages, wp, interpret), (x, stages)


def _cc_bwd(wp, interpret, res, g):
    x, stages = res
    _, vjp = jax.vjp(conv_chain_xla, x, stages)
    return tuple(vjp(g))


conv_chain.defvjp(_cc_fwd, _cc_bwd)


def conv_chain_mode(x: jnp.ndarray, features: int,
                    depth: int) -> tuple[str, int] | None:
    """Routing guard for models/blocks.ConvSequence: None (use XLA) or
    (mode, wp) with mode in {"tpu", "interp"}. Applies to plain
    narrow-input eval chains at 3D shapes with 8-aligned depth — the
    flagship full-res down_block_0. OPT-IN via PULPO_FUSED_CONVSEQ=1
    until the composed flagship A/B lands (module docstring)."""
    from pulpo_tpu import routing

    flag = routing.get("PULPO_FUSED_CONVSEQ")
    if flag == "0":
        return None
    if x.ndim != 5 or x.shape[-1] > MAX_CIN or not 2 <= depth <= MAX_DEPTH:
        return None
    if features > 64:  # ring budget; wide chains are fine in XLA anyway
        return None
    if x.dtype not in (jnp.bfloat16, jnp.float32):
        return None
    S0, S1, S2 = x.shape[1:-1]
    if S2 + 2 <= 128:
        wp = 128
    elif S2 + 2 <= 256:
        wp = 256
    else:
        return None
    if not (S0 % BZ == 0 and S0 >= 2 * BZ and S0 * S1 * S2 >= 32768):
        return None
    # VMEM bound: rings dominate ((D-1) * 4 slots * features * flat)
    dtb = 2 if x.dtype == jnp.bfloat16 else 4
    cin = x.shape[-1]
    ghost_flat = (S1 + 3) * wp
    est = dtb * ((depth - 1) * NRING * features * ghost_flat
                 + cin * ZSLAB * ghost_flat        # xbuf
                 + 27 * cin * S1 * wp              # colbuf
                 + features * S1 * wp)             # obuf
    if est > 80 * 2**20:
        return None
    if flag == "interp":
        return ("interp", wp)
    return ("tpu", wp) if jax.default_backend() == "tpu" else None
