"""Pallas TPU kernel: the WHOLE per-sample posterior head fused on the MXU.

The UQ decode's per-sample FLOPs are dominated by two ConvSequences that
run once per posterior sample at every non-coarsest level (reference
pulpo.py:118-125 feedback merge, 235-240 concat):

    up_block:  ConvUnit(c_fb -> n0*zdim) -> ConvUnit(-> n0*zdim)
    merge:     ConvUnit(concat(up, act) -> n_merge) -> ConvUnit(-> n_merge)
    mu_sigma:  1x1 conv -> mu, 1x1 conv -> softplus -> sigma

Together 0.97 of the 1.371 TFLOP/sample (PERF.md FLOP recount), measured
composed at only 34-45 TF/s on v5e against a 77 TF/s per-shape XLA
ceiling — the gap is layout staging between the ops. Per the round-3
composition rule (isolated wins lose composed when the custom-call seam
sits on a wide tensor: attic/conv_narrow.py was 1.8x isolated and
-2.9% composed), this kernel fuses the ENTIRE head so both seams are
thin: input = the c_fb(~16)-channel resized feedback stack, outputs =
mu and sigma (zdim=3 channels each). Every 96/64/128-channel
intermediate lives only in VMEM.

Structure (per grid step = one df row x one 8-slice z-octet):

    DMA a 16-slice ghosted input window (channels-first flat planes,
    vel_head.py layout: (y, x) of slice s at flat (s + 4, (y+1)*WP+x+1)).
    4-deep conv pipeline, one z slice per stage per iteration:
      conv1 (c_fb -> n_up):  transposed im2col (27 block copies of the
            (c_fb, flat) shifted plane) + ONE (27*c_fb, n_up) MXU dot
      conv2 (n_up -> n_up):  27 per-tap (n_up, n_up) MXU dots over the
            ghosted ring of conv1 planes
      conv3 (n_up -> n_merge): 27 per-tap dots + the per-PAIR activation
            half y2 (DMA'd per slice, row r reads pair r % B — the
            split-merge dedupe of models/blocks._RawConv) then BN+LReLU
      conv4 (n_merge -> n_merge): 27 per-tap dots
      heads: one (2*zdim, n_merge) 1x1 dot; softplus on the sigma rows;
            per-slice staged output DMA.

    Ring buffers hold 4 slices per stage (8 % 4 == 0 keeps slot indices
    static) and PERSIST across grid steps: at step zi > 0 the rings
    already hold the slices the pipeline needs, so only the 8 new
    slices per stage are computed — the pipeline warmup (and its
    recompute tax, which vel_head.py pays every step) runs once per row
    at zi == 0.

Numerics mirror the flax/XLA eval composition op-for-op (same contract
as kernels/vel_head.py): convs accumulate f32 on the MXU and round to
the compute dtype before bias/merge adds; eval BatchNorm applies
(f32(x) - mean) * (rsqrt(var + eps) * scale) + bias in f32 (flax
normalization.py with running stats) and casts; LeakyReLU(0.2) and
softplus run in the compute dtype. Interpret-mode tests pin equality
against the unfused flax path at f32 and bf16 (tests/test_kernels.py).

Routing is wired in models/pulpo.Autoencoder (eval only — BN batch
stats rule out training) behind PULPO_FUSED_POSTHEAD: "1" = on where
applicable, unset/"0" = off, "interp" = CPU interpret test hook.

STAYS OPT-IN after the round-4 composed A/B: despite 2.53x (l0) /
1.43x (l1) isolated hardware wins, the flagship bench measured -6.0%
with it routed (0.3387 vs an interleaved 0.3602 baseline; l0-only was
-11.7%) — the custom-call seams un-fuse the feedback-resize producer
and the y2 act-half (which XLA otherwise fuses into consumers), and
the staging transposes outweigh the MXU win. Fifth confirmation of
the composed-vs-isolated rule; PERF.md round-4 ladder has the data.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_CFB = 32
WP = 128   # flattened-plane row pitch (lane tile); needs S2 + 2 <= WP
BZ = 8     # output z-slices per grid step (8-aligned DMA windows)
ZSLAB = 16
GHOST = 4  # front z ghost: the 4-conv pipeline leads the output by 3
           # slices, +1 for conv1's own z halo
NRING = 4  # ring slots per stage; BZ % NRING == 0 -> static slot ids


from pulpo_tpu.kernels.activations import leaky as _leaky
from pulpo_tpu.kernels.activations import leaky_from_f32 as _leaky_f32
from pulpo_tpu.kernels.activations import softplus_dt as _softplus_dt


def _kernel(x_hbm, y2_hbm, w1_ref, w2_ref, w3_ref, w4_ref, wh_ref,
            bu_ref, bm_ref, bh_ref, bnu_ref, bnm_ref, out_hbm,
            xbuf, colbuf, ring1, ring2, ring3, y2buf, obuf,
            sem_x, sem_y, sem_o,
            *, spatial, c_fb: int, n_up: int, n_merge: int, zd: int,
            b_pair: int):
    """One (row, z-octet) grid step: out[r, :, zi*BZ : zi*BZ + BZ].

    x_hbm: (R, c_fb, S0 + 8, (S1 + 3) * WP), slice s at z-index s + 4.
    y2_hbm: (B, S0 + 1, n_merge, S1 * WP) — the per-pair merge activation
    half in UNghosted flat layout ((y, x) at y*WP + x); index S0 is a
    zero slice (safe target for masked-out reads).
    w1_ref: (27 * c_fb, n_up) dt. w2/w3/w4_ref: (27, out, in) dt with
    w[tap] = kernel[tap].T. wh_ref: (2*zd, n_merge) dt (mu rows then
    sigma rows). bu_ref: (2, n_up) f32, values pre-rounded to dt
    (conv1/conv2 biases; the in-kernel .astype(dt) recovers the exact
    XLA bias — hardware Mosaic rejects non-32-bit minor-dim reshapes);
    bm_ref: (2, n_merge) f32 likewise; bh_ref: (2*zd, 1) dt (2D with a
    32-bit-safe layout, so it stays dt). bnu_ref/bnm_ref: (6, n) f32 —
    mean, rsqrt(var+eps)*scale, bias for the stage's two BNs.
    ring*: (NRING, n, (S1 + 3) * WP) dt ghosted activation planes,
    slice t in slot t % NRING; ghost rows zeroed once per row.
    """
    r = pl.program_id(0)
    zi = pl.program_id(1)
    S0, S1, S2 = spatial
    flat = S1 * WP
    dt = xbuf.dtype
    t0 = zi * BZ  # traced

    dma = pltpu.make_async_copy(
        x_hbm.at[r, :, pl.ds(zi * BZ, ZSLAB)], xbuf, sem_x)
    dma.start()
    dma.wait()

    lane_ok = jax.lax.broadcasted_iota(jnp.int32, (S1, WP), 1) < S2

    def ghosted_store(ring, slot: int, a, t):
        """Mask SAME-pad ghosts (lanes x >= S2, whole plane when t is
        outside [0, S0)) and store `a` (n, flat) re-ghosted into the
        ring: interior x lands at lane x+1 via a right roll (the
        wrapped-in lane is a masked-zero ghost)."""
        n = a.shape[0]
        valid = jnp.logical_and(t >= 0, t < S0)
        a3 = a.reshape(n, S1, WP)
        a3 = jnp.where(jnp.logical_and(lane_ok[None], valid), a3,
                       jnp.zeros((), dt))
        # hardware Mosaic implements tpu.dynamic_rotate only for 32-bit
        # lanes: roll in f32 and round back (exact for bf16 values)
        ring[slot, :, WP:WP + flat] = pltpu.roll(
            a3.reshape(n, flat).astype(jnp.float32), 1, axis=1).astype(dt)

    def bn_act(a, bn_ref, row0: int):
        y = ((a.astype(jnp.float32) - bn_ref[row0][:, None])
             * bn_ref[row0 + 1][:, None] + bn_ref[row0 + 2][:, None])
        return _leaky_f32(y, dt)

    def tap_conv(ring, w_ref, j: int):
        """27-tap conv over ghosted ring planes t-1, t, t+1 (slots
        (j-1+dz) % NRING): sum of (out, in) x (in, flat) MXU dots.

        The dz axis runs as a fori_loop (slot and tap become traced
        LEADING-dim indices — untiled, so dynamic indexing is legal,
        unlike sublane/lane dims): 9 dots live per iteration instead
        of 27, which cuts both the Mosaic program size (the l0 compile
        was 33 min fully unrolled) and the scoped-stack high-water
        (141M > 128M physical at the 100M cap). Summation order is
        identical (dz-major either way) -> bit-identical results."""
        n_out = w_ref.shape[1]

        def dz_body(dz, acc):
            slot = jax.lax.rem(j - 1 + dz + NRING, NRING)
            for dy in range(3):
                for dx in range(3):
                    tap = (dz * 3 + dy) * 3 + dx
                    off = dy * WP + dx
                    d = jax.lax.dot_general(
                        w_ref[tap], ring[slot, :, off:off + flat],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc = acc + d
            return acc

        return jax.lax.fori_loop(
            0, 3, dz_body, jnp.zeros((n_out, flat), jnp.float32))

    def conv1_slice(j: int):
        """up_block unit 1 for slice t = t0 + j -> ring1[j % NRING].
        Input slice s sits at window index s - t0 + GHOST = j + GHOST."""
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    tap = (dz * 3 + dy) * 3 + dx
                    off = dy * WP + dx
                    colbuf[tap * c_fb:(tap + 1) * c_fb, :] = xbuf[
                        :, j + GHOST - 1 + dz, off:off + flat]
        acc = jax.lax.dot_general(
            w1_ref[...], colbuf[...], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # XLA conv rounds its f32 accumulation to dt BEFORE the bias add
        a = acc.astype(dt) + bu_ref[0][:, None].astype(dt)
        ghosted_store(ring1, j % NRING, bn_act(a, bnu_ref, 0), t0 + j)

    def conv2_slice(j: int):
        acc = tap_conv(ring1, w2_ref, j)
        a = acc.astype(dt) + bu_ref[1][:, None].astype(dt)
        ghosted_store(ring2, j % NRING, bn_act(a, bnu_ref, 3), t0 + j)

    def conv3_slice(j: int):
        """Merge unit 1: conv over the up_block half + the per-pair
        activation half y2 (models/blocks._RawConv split application:
        conv_a(fb) + conv_b(act) + bias, then BN + LReLU)."""
        t = t0 + j
        dma_y = pltpu.make_async_copy(
            y2_hbm.at[jax.lax.rem(r, b_pair),
                      jnp.minimum(jnp.maximum(t, 0), S0)],
            y2buf, sem_y)
        dma_y.start()
        acc = tap_conv(ring2, w3_ref, j)
        dma_y.wait()
        a = (acc.astype(dt) + y2buf[...]
             + bm_ref[0][:, None].astype(dt))
        ghosted_store(ring3, j % NRING, bn_act(a, bnm_ref, 0), t)

    def out_slice(k: int):
        """Merge unit 2 + the mu/sigma 1x1 heads for output slice
        t = t0 + k (always in [0, S0))."""
        acc = tap_conv(ring3, w4_ref, k)
        a = acc.astype(dt) + bm_ref[1][:, None].astype(dt)
        a = bn_act(a, bnm_ref, 3)
        h = jax.lax.dot_general(
            wh_ref[...], a, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        h = h.astype(dt) + bh_ref[...].astype(dt)
        mu = h[:zd]
        # dt, matching MuSigmaBlock's jax.nn.softplus bit-for-bit on
        # finite values (hardware Mosaic rejects the bf16 compares
        # inside jax.nn.softplus — activations.softplus_dt)
        sg = _softplus_dt(h[zd:], dt)
        obuf[...] = jnp.concatenate([mu, sg], axis=0).reshape(
            2 * zd, S1, WP)
        dma_o = pltpu.make_async_copy(
            obuf, out_hbm.at[r, :, t0 + k], sem_o)
        dma_o.start()
        dma_o.wait()

    @pl.when(zi == 0)
    def _warmup():
        # ghost rows of every ring slot: zeroed once per row (interior
        # rows are fully overwritten per slice; scratch persists)
        for ring, n in ((ring1, n_up), (ring2, n_up), (ring3, n_merge)):
            zlead = jnp.zeros((n, WP), dt)
            ztail = jnp.zeros((n, 2 * WP), dt)
            for s in range(NRING):
                ring[s, :, 0:WP] = zlead
                ring[s, :, (S1 + 1) * WP:(S1 + 3) * WP] = ztail
        # t = -1 plane of ring1 (slot 3): conv2(0) reads it as zeros
        ring1[NRING - 1, :, :] = jnp.zeros(
            (n_up, (S1 + 3) * WP), dt)
        # pipeline warmup: the steady-state iteration at k = -3..-1 with
        # negative-t stages statically writing zero planes
        zup = jnp.zeros((n_up, flat), dt)
        zmg = jnp.zeros((n_merge, flat), dt)
        # k = -3
        conv1_slice(0)
        ghosted_store(ring2, (-1) % NRING, zup, jnp.int32(0))   # conv2(-1)
        ghosted_store(ring3, (-2) % NRING, zmg, jnp.int32(0))   # conv3(-2)
        # k = -2
        conv1_slice(1)
        conv2_slice(0)
        ghosted_store(ring3, (-1) % NRING, zmg, jnp.int32(0))   # conv3(-1)
        # k = -1
        conv1_slice(2)
        conv2_slice(1)
        conv3_slice(0)

    for k in range(BZ):
        conv1_slice(k + 3)
        conv2_slice(k + 2)
        conv3_slice(k + 1)
        out_slice(k)


def posterior_head_fused(fb: jnp.ndarray, y2: jnp.ndarray, p: dict,
                         interpret: bool = False
                         ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused posterior head (module docstring): (mu, sigma).

    fb: (R, S0, S1, S2, c_fb) channels-last resized feedback stack, one
    row per posterior sample (R = S * B, sample-major). y2: (B, *, n_merge)
    per-pair raw merge-conv activation half (models/blocks._RawConv
    act_half — no bias). p: parameter dict — up_block units (uk1/ub1/
    umean1/uvar1/uscale1/ubias1, uk2/...2), merge units (mk1 = the fb
    half slice of the split kernel, mb1/..., mk2/...), heads (hkmu/hbmu,
    hksig/hbsig). Callers check `pos_head_mode` first.
    """
    R, S0, S1, S2, c_fb = fb.shape
    B = y2.shape[0]
    n_up = p["uk1"].shape[-1]
    n_merge = p["mk1"].shape[-1]
    zd = p["hkmu"].shape[-1]
    dt = fb.dtype
    assert p["uk1"].shape == (3, 3, 3, c_fb, n_up), p["uk1"].shape
    assert p["uk2"].shape == (3, 3, 3, n_up, n_up), p["uk2"].shape
    assert p["mk1"].shape == (3, 3, 3, n_up, n_merge), p["mk1"].shape
    assert p["mk2"].shape == (3, 3, 3, n_merge, n_merge), p["mk2"].shape
    assert p["hkmu"].shape == (1, 1, 1, n_merge, zd), p["hkmu"].shape
    assert y2.shape == (B, S0, S1, S2, n_merge), (y2.shape, fb.shape)
    assert R % B == 0, (R, B)
    assert S2 + 2 <= WP and S0 % BZ == 0, (S0, S2)

    # input: channels-first ghosted flat planes, slice s at z-index s+4
    xcf = jnp.transpose(fb, (0, 4, 1, 2, 3))
    xp = jnp.pad(xcf, ((0, 0), (0, 0), (GHOST, 8 - GHOST),
                       (1, 2), (1, WP - S2 - 1)))
    xf = xp.reshape(R, c_fb, S0 + 8, (S1 + 3) * WP)
    # y2: per-pair, unghosted flat planes + one trailing zero z slice
    y2cf = jnp.transpose(y2.astype(dt), (0, 1, 4, 2, 3))
    y2p = jnp.pad(y2cf, ((0, 0), (0, 1), (0, 0), (0, 0), (0, WP - S2)))
    y2f = y2p.reshape(B, S0 + 1, n_merge, S1 * WP)

    tapT = lambda k: jnp.transpose(
        k.astype(dt).reshape(27, k.shape[-2], k.shape[-1]), (0, 2, 1))
    w1 = p["uk1"].astype(dt).reshape(27 * c_fb, n_up)
    w2, w3, w4 = tapT(p["uk2"]), tapT(p["mk1"]), tapT(p["mk2"])
    wh = jnp.concatenate([
        p["hkmu"].astype(dt).reshape(n_merge, zd).T,
        p["hksig"].astype(dt).reshape(n_merge, zd).T,
    ])
    # bias rows ride as f32 (values pre-rounded to dt; the in-kernel
    # .astype(dt) recovers the exact XLA bias): hardware Mosaic rejects
    # the (n,) -> (n, 1) minor-dim reshape for non-32-bit types
    bu = jnp.stack([p["ub1"].astype(dt),
                    p["ub2"].astype(dt)]).astype(jnp.float32)
    bm = jnp.stack([p["mb1"].astype(dt),
                    p["mb2"].astype(dt)]).astype(jnp.float32)
    bh = jnp.concatenate(
        [p["hbmu"].astype(dt), p["hbsig"].astype(dt)])[:, None]
    eps = jnp.float32(1e-5)

    def aff(pre, n):
        # the flax eval-BN affine: mul = rsqrt(var + eps) * scale
        return [p[f"{pre}mean{n}"].astype(jnp.float32),
                jax.lax.rsqrt(p[f"{pre}var{n}"].astype(jnp.float32) + eps)
                * p[f"{pre}scale{n}"].astype(jnp.float32),
                p[f"{pre}bias{n}"].astype(jnp.float32)]

    bnu = jnp.stack(aff("u", 1) + aff("u", 2))
    bnm = jnp.stack(aff("m", 1) + aff("m", 2))

    kern = functools.partial(
        _kernel, spatial=(S0, S1, S2), c_fb=c_fb, n_up=n_up,
        n_merge=n_merge, zd=zd, b_pair=B)
    out = pl.pallas_call(
        kern,
        grid=(R, S0 // BZ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 10,
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((R, 2 * zd, S0, S1, WP), dt),
        scratch_shapes=[
            pltpu.VMEM((c_fb, ZSLAB, (S1 + 3) * WP), dt),
            pltpu.VMEM((27 * c_fb, S1 * WP), dt),
            pltpu.VMEM((NRING, n_up, (S1 + 3) * WP), dt),
            pltpu.VMEM((NRING, n_up, (S1 + 3) * WP), dt),
            pltpu.VMEM((NRING, n_merge, (S1 + 3) * WP), dt),
            pltpu.VMEM((n_merge, S1 * WP), dt),
            pltpu.VMEM((2 * zd, S1, WP), dt),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        # lift the 16M scoped-VMEM default (a compiler default, not
        # physical): this kernel's scratch alone (xbuf + colbuf + three
        # rings) is ~43M at the l0 shape, and the unrolled 4-conv tap
        # chains need stack on top. The limit is also the STACK BUDGET
        # the scheduler feels free to use: at 100M it scheduled a ~97M
        # high-water and blew the 128M physical VMEM by 13M (round-4
        # hardware probe) — 76M forces it to economize while staying
        # far above the 16M default.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=76 * 1024 * 1024),
        interpret=interpret,
    )(xf, y2f, w1, w2, w3, w4, wh, bu, bm, bh, bnu, bnm)
    o = jnp.transpose(out[..., :S2], (0, 2, 3, 4, 1))
    return o[..., :zd], o[..., zd:]


def posterior_head_xla(fb: jnp.ndarray, y2: jnp.ndarray, p: dict
                       ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """The unfused reference composition (exactly what the flax
    up_block + PULPoEncoder compute at eval with the split merge conv,
    models/blocks.py + models/pulpo.py): interpret-mode golden oracle
    and the custom-VJP backward."""
    from pulpo_tpu.ops.conv import _conv_xla

    dt = fb.dtype
    eps = jnp.float32(1e-5)

    def bn_eval(x, pre, n):
        mul = (jax.lax.rsqrt(p[f"{pre}var{n}"].astype(jnp.float32) + eps)
               * p[f"{pre}scale{n}"])
        y = (x - p[f"{pre}mean{n}"]) * mul + p[f"{pre}bias{n}"]
        return y.astype(dt)

    x = _conv_xla(fb, p["uk1"].astype(dt)) + p["ub1"].astype(dt)
    x = _leaky(bn_eval(x, "u", 1), dt)
    x = _conv_xla(x, p["uk2"].astype(dt)) + p["ub2"].astype(dt)
    x = _leaky(bn_eval(x, "u", 2), dt)
    ya = _conv_xla(x, p["mk1"].astype(dt))
    y2 = y2.astype(dt)
    if y2.shape[0] != ya.shape[0]:
        s = ya.shape[0] // y2.shape[0]
        y2 = jnp.broadcast_to(y2[None], (s, *y2.shape)).reshape(
            s * y2.shape[0], *y2.shape[1:])
    x = ya + y2 + p["mb1"].astype(dt)
    x = _leaky(bn_eval(x, "m", 1), dt)
    x = _conv_xla(x, p["mk2"].astype(dt)) + p["mb2"].astype(dt)
    x = _leaky(bn_eval(x, "m", 2), dt)
    mu = _conv_xla(x, p["hkmu"].astype(dt)) + p["hbmu"].astype(dt)
    sg = _conv_xla(x, p["hksig"].astype(dt)) + p["hbsig"].astype(dt)
    return mu, jax.nn.softplus(sg)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def posterior_head(fb: jnp.ndarray, y2: jnp.ndarray, p: dict,
                   interpret: bool = False):
    """posterior_head_fused with the XLA-composition VJP (the kernel is
    an inference accelerator; the eval path never differentiates, but an
    accidental grad must not crash — same pattern as vel_head)."""
    return posterior_head_fused(fb, y2, p, interpret=interpret)


def _ph_fwd(fb, y2, p, interpret):
    return posterior_head(fb, y2, p, interpret), (fb, y2, p)


def _ph_bwd(interpret, res, g):
    fb, y2, p = res
    _, vjp = jax.vjp(posterior_head_xla, fb, y2, p)
    return tuple(vjp(g))


posterior_head.defvjp(_ph_fwd, _ph_bwd)


def pos_head_mode(fb: jnp.ndarray, n_up: int, n_merge: int,
                  zd: int) -> str | None:
    """Routing guard for models/pulpo.Autoencoder: None (use XLA),
    "tpu", or "interp" (CPU interpret-mode test hook). Applies at
    level-res 3D shapes with 8-aligned depth — the flagship l0/l1
    (l2's n_merge = 6*n0 = 192 exceeds the ring budget and its volume
    is below the floor anyway). OPT-IN via PULPO_FUSED_POSTHEAD=1 until
    the composed flagship A/B lands (module docstring)."""
    from pulpo_tpu import routing

    flag = routing.get("PULPO_FUSED_POSTHEAD")
    if flag == "0":
        return None
    if zd != 3 or fb.ndim != 5 or fb.shape[-1] > MAX_CFB:
        return None
    if n_up > 128 or n_merge > 128:
        return None
    if fb.dtype not in (jnp.bfloat16, jnp.float32):
        return None
    S0, S1, S2 = fb.shape[1:-1]
    # PULPO_POSTHEAD_MIN_VOL: volume floor for the fused routing. The
    # round-4 composed A/B ladder: l0+l1 routed = -6.0% (0.3387 vs
    # 0.3603) despite 2.53x/1.43x isolated wins — the floor lets the
    # l0-only variant be A/B'd without code churn.
    min_vol = int(routing.get("PULPO_POSTHEAD_MIN_VOL"))
    if not (S2 + 2 <= WP and S0 % BZ == 0 and S0 >= 2 * BZ
            and S0 * S1 * S2 >= min_vol):
        return None
    if flag == "interp":
        return "interp"
    return "tpu" if jax.default_backend() == "tpu" else None
