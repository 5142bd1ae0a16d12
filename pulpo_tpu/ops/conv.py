"""3-D convolution with a tap-sum (shifted-matmul) backward.

Why this exists: the full-res train step OOMs on a 16G v5e because
XLA's conv *backward* emitters at (160, 192, 224, C=32) bf16 pick a
spatially-split, tap-expanded layout for the saved activations — a
1.27G leaky_relu output is materialized as bf16[160,192,8,29,32,3] with
4.0x padding expansion (5.10G), and five more 1.7G siblings alongside
(round-3 OOM dump, /tmp/bench_train_b1.log): 16.49G for a program whose
unpadded live set is 5.23G. The forward conv is fine (the inference UQ
program never sees these temps).

The fix: keep the fast XLA forward, but define the VJP by hand as
K^3 shifted matmuls (convolution is a sum of channel-mixing matmuls,
one per tap):

  dL/dx[u] = sum_t  g[u + p - t] @ k[t]^T     (pad g, slice per tap)
  dL/dk[t] = x_pad[t : t+S]^T @ g             (pad x, slice per tap)

Every operand keeps its natural channels-last layout; the per-tap
slices are strided reads XLA fuses into the matmuls, and no
tap-expanded temp ever exists. Matmuls accumulate in f32.

Used by models/blocks.py for large-volume 3x3x3 convs (the full-res
DownPath blocks, reference pulpo.py:9-62); small volumes keep the
plain XLA vjp (its temps are harmless there and the emitter's fused
backward is faster at level-res shapes).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from pulpo_tpu import routing


def TAPGRAD_MIN_VOXELS() -> int:
    """Spatial-volume threshold above which ConvUnit routes through the
    tap-sum backward (full-res 160x192x224 = 6.9M; the largest latent-
    res level is 80x96x112 = 0.86M and stays on the XLA vjp)."""
    return int(routing.get("PULPO_CONV_TAPGRAD_MIN_VOXELS"))


def _dn(nd: int) -> jax.lax.ConvDimensionNumbers:
    """Channels-last dimension numbers (flax linear.py convention)."""
    lhs = (0, nd - 1) + tuple(range(1, nd - 1))
    rhs = (nd - 1, nd - 2) + tuple(range(0, nd - 2))
    return jax.lax.ConvDimensionNumbers(lhs, rhs, lhs)


def _conv_xla(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """SAME channels-last conv (the forward path, unchanged)."""
    ndims = x.ndim - 2
    return jax.lax.conv_general_dilated(
        x, k, window_strides=(1,) * ndims, padding="SAME",
        dimension_numbers=_dn(x.ndim))


@jax.custom_vjp
def conv3d_tapgrad(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """SAME 3-D conv, XLA forward, tap-sum backward.

    x: (B, S0, S1, S2, Cin); k: (K, K, K, Cin, Cout), K odd.
    """
    return _conv_xla(x, k)


def _tapgrad_fwd(x, k):
    return _conv_xla(x, k), (x, k)


def _tapgrad_bwd(res, g):
    x, k = res
    K = k.shape[0]
    assert k.shape[:3] == (K, K, K) and K % 2 == 1, k.shape
    p = (K - 1) // 2
    spatial = x.shape[1:-1]
    b = x.shape[0]
    ci, co = k.shape[-2], k.shape[-1]
    n = b
    for s in spatial:
        n *= s

    # dL/dx: a SAME stride-1 conv's input gradient IS a forward conv
    # of the cotangent with the spatially-flipped, ci/co-swapped
    # kernel — and lax.conv with an ordinary kernel operand uses XLA's
    # FORWARD emitter, not the conv-backward-input emitter whose
    # tap-expanded layouts caused the round-3 OOM. Round-5 bisect
    # finding: the previous formulation (27 shifted matmuls in a
    # fori_loop) re-read and re-wrote the (n, Ci) f32 dx accumulator
    # every tap (~47 GB of HBM traffic per full-res conv vs ~1.3 GB
    # useful); the forward conv runs at the measured per-shape conv
    # rate instead (PERF.md conv table). Bonus: with dx out of the
    # loop carry, XLA can DCE it entirely where the input gradient is
    # unused (the DownPath's first conv — its input is the data).
    k_rev = jnp.flip(k, (0, 1, 2)).swapaxes(-1, -2)  # (K,K,K,Co,Ci)
    dx = _conv_xla(g, k_rev)

    # dL/dk[t] = x_pad[t:t+S]^T @ g — ONE conv with permuted dimension
    # numbers: ci rides the conv's batch dim, the model batch b is the
    # contraction (input-feature) dim, and g is the K^3-output "filter"
    # (the classic weight-gradient conv). Round-5 probe
    # (probe_conv_bwd2, full-res B=1 v5e): 0.123 s vs the 27-tap
    # fori_loop's 0.310 s at 32->32 (2.5x — the loop re-read the
    # shifted x window + g every tap, ~24 GB), 0.065 vs 0.121 at 2->32;
    # COMPOSED VERDICT (round 5): the conv spelling is 2.5x isolated
    # but unusable inside the full-res train program on a 16G part —
    # XLA hoists the operands' 4x-padded tap-expanded relayout to the
    # FULL arrays (1.7G per operand; z-chunked slicing does not
    # prevent the hoist) and the step OOMs by ~0.9G. Default is the
    # tap LOOP; PULPO_TAPGRAD_DK=conv opts into the chunked-conv
    # spelling on bigger-HBM parts.
    if routing.get("PULPO_TAPGRAD_DK") != "conv":
        gr = g.reshape(n, co)
        xp = jnp.pad(x, ((0, 0),) + ((p, p),) * 3 + ((0, 0),))
        unroll = int(routing.get("PULPO_TAPGRAD_UNROLL"))
        if K**3 % unroll != 0:
            unroll = 1

        def body(tg, dk_acc):
            for j in range(unroll):
                t = tg * unroll + j
                tz = t // (K * K)
                ty = (t // K) % K
                tx = t % K
                sl_x = jax.lax.dynamic_slice(
                    xp, (0, tz, ty, tx, 0), (b, *spatial, ci)).reshape(n, ci)
                dk_t = jax.lax.dot_general(
                    sl_x, gr, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dk_acc = jax.lax.dynamic_update_index_in_dim(
                    dk_acc, dk_t, t, 0)
            return dk_acc

        dk = jax.lax.fori_loop(
            0, K**3 // unroll, body,
            jnp.zeros((K**3, ci, co), jnp.float32)).reshape(k.shape)
    else:
        # z-chunked: the weight-grad conv's emitter re-lays-out its lhs
        # (the SAVED activation) as a 4x-padded tap-expanded temp —
        # 5.10G for the whole full-res volume, which OOMed the composed
        # train program (same class as the round-3 conv-backward OOM;
        # the standalone probe fit). Summing per-z-chunk convs is exact
        # (the contraction is linear over any z partition) and shrinks
        # the relayout temp by the chunk count.
        xp = jnp.pad(x, ((0, 0),) + ((p, p),) * 3 + ((0, 0),))
        dn = jax.lax.ConvDimensionNumbers(
            lhs_spec=(4, 0, 1, 2, 3),   # xp: batch=ci, feature=b
            rhs_spec=(4, 0, 1, 2, 3),   # g:  out_feat=co, in_feat=b
            out_spec=(0, 4, 1, 2, 3),   # out: (ci, K, K, K, co)
        )
        S0 = spatial[0]
        want = int(routing.get("PULPO_TAPGRAD_DK_CHUNKS"))
        nchunks = 1
        for c_ in range(min(want, S0), 0, -1):
            if S0 % c_ == 0:
                nchunks = c_
                break
        if nchunks == 1:
            dk = jax.lax.conv_general_dilated(
                xp, g, window_strides=(1, 1, 1), padding="VALID",
                dimension_numbers=dn, preferred_element_type=jnp.float32)
        else:
            # Python-unrolled (NOT a fori_loop: a conv inside a loop
            # body wedged the relay's whole-program compile >30 min,
            # round 5). Static slices chain through the adds, so XLA
            # schedules the chunk convs sequentially and one relayout
            # temp dominates at a time.
            per = S0 // nchunks
            dk = jnp.zeros((ci, K, K, K, co), jnp.float32)
            for i_ in range(nchunks):
                xw = jax.lax.slice_in_dim(xp, i_ * per,
                                          i_ * per + per + 2 * p, axis=1)
                gw = jax.lax.slice_in_dim(g, i_ * per, (i_ + 1) * per,
                                          axis=1)
                dk = dk + jax.lax.conv_general_dilated(
                    xw, gw, window_strides=(1, 1, 1), padding="VALID",
                    dimension_numbers=dn,
                    preferred_element_type=jnp.float32)
        dk = jnp.transpose(dk, (1, 2, 3, 0, 4))  # (K, K, K, ci, co)

    dx = dx.astype(x.dtype)
    dk = dk.astype(k.dtype)
    return dx, dk


conv3d_tapgrad.defvjp(_tapgrad_fwd, _tapgrad_bwd)


def use_tapgrad(x: jnp.ndarray, kernel_size: int, padding) -> bool:
    """Route policy: 3-D SAME odd-kernel convs over large volumes on
    TPU (where the XLA conv-backward layouts explode; see module
    docstring). Threshold via PULPO_CONV_TAPGRAD_MIN_VOXELS."""
    if routing.get("PULPO_NO_TAPGRAD"):
        return False
    if x.ndim != 5 or kernel_size < 3 or kernel_size % 2 != 1 \
            or padding != "SAME":
        return False
    vol = 1
    for s in x.shape[1:-1]:
        vol *= s
    return vol >= TAPGRAD_MIN_VOXELS()
