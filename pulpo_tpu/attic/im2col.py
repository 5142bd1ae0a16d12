"""im2col+matmul 3x3x3 conv — a MEASURED NEGATIVE on TPU (attic).

Moved from ops/conv.py (round 4, VERDICT #9): nothing routes here;
PERF.md "Conv throughput by shape" keeps the measurements
(3->32 xla 17.9 ms vs im2col 76.6 ms; 16->96 10.0 vs 358.6 on v5e).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from pulpo_tpu.ops.conv import _conv_xla


# im2col for narrow-input convs: a MEASURED NEGATIVE on TPU, kept as
# documentation (and correct + tested for any future non-TPU use). The
# hypothesis was that 27 shifted SAME-padded views concatenated
# channel-wise + ONE (rows, 27*cin) x (27*cin, cout) matmul would feed
# the MXU a full-K contraction where XLA's conv emitter idles at narrow
# cin (3->32 runs 2.0 TF/s). Measured v5e l0 shape (8, 80, 96, 112)
# (scripts/probe_conv4.py): 3->32 xla 17.9 ms vs im2col 76.6 ms (4.3x
# WORSE); 16->96 xla 10.0 ms vs im2col 358.6 ms (36x worse) — the
# 27-view concat lowers to 27 badly-laid-out pads/copies that dwarf the
# matmul. Nothing routes here by default (models/blocks.py keeps the
# XLA conv); XLA's 64/96-wide rates are 67-113 TF/s, so the conv
# emitter is not the composed-decode bottleneck either.
IM2COL_MAX_CIN = int(os.environ.get("PULPO_CONV_IM2COL_MAX_CIN", "16"))


def _conv3d_im2col_impl(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    kz, ky, kx, cin, cout = k.shape
    assert (kz, ky, kx) == (3, 3, 3), k.shape
    B, D, H, W, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    views = [xp[:, dz:dz + D, dy:dy + H, dx:dx + W, :]
             for dz in range(3) for dy in range(3) for dx in range(3)]
    col = jnp.concatenate(views, axis=-1)  # (B, D, H, W, 27*cin)
    y = jax.lax.dot_general(
        col.reshape(-1, 27 * cin), k.reshape(27 * cin, cout),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    return y.astype(x.dtype).reshape(B, D, H, W, cout)


@jax.custom_vjp
def conv3d_im2col(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """SAME 3x3x3 conv: im2col+matmul forward (MXU-fed for narrow cin),
    with the plain XLA conv VJP (autodiff through the 27-view concat
    would scatter-add 27 full-size pad grads; the conv backward's
    numerics and memory behavior stay exactly as before)."""
    return _conv3d_im2col_impl(x, k)


def _im2col_fwd(x, k):
    return _conv3d_im2col_impl(x, k), (x, k)


def _im2col_bwd(res, g):
    x, k = res
    _, vjp = jax.vjp(_conv_xla, x, k)
    return tuple(vjp(g))


conv3d_im2col.defvjp(_im2col_fwd, _im2col_bwd)


def use_im2col(x: jnp.ndarray, kernel_size: int, padding) -> bool:
    """Route policy: 3-D SAME 3x3x3 convs with narrow input channels on
    TPU. Mutually exclusive with use_tapgrad (checked first by the
    caller); PULPO_NO_IM2COL disables."""
    if os.environ.get("PULPO_NO_IM2COL"):
        return False
    if jax.default_backend() != "tpu":
        return False
    return (x.ndim == 5 and kernel_size == 3 and padding == "SAME"
            and x.shape[-1] <= IM2COL_MAX_CIN)
