"""On-chip uncertainty quantification.

TPU-native replacement for the reference's host-driven N-sample loop
(`Evaluate.predict` with N>1, evaluate.py:205-280): the N posterior
draws run as one vmapped program on-chip — per-sample decode, per-sample
SVF composition + integration, and the std reductions all fused into a
single jitted call.

Semantics follow the reference's (correct) batched 2D path
(evaluate.py:253-277), applied to 3D:

- mean prediction = integrate the *mean SVF* (average of the N
  individual dfs), then re-warp the moving image (evaluate.py:266-273).
  (The reference's 3D loop at evaluate.py:238 accidentally averages only
  the *last* draw — `individual_dfs[key].mean(dim=0)` on a size-1 batch
  — a bug we do not replicate.)
- per-level std maps over the N samples, channel-averaged:
  `mean(std(all_X, axis=samples), axis=channel)`
  (evaluate.py:243,275-277) with Bessel-corrected std (torch default).
- per-sample final dfs come from per-sample combine+integrate
  (evaluate.py:268), so `final_df_std` reflects integration, not just
  SVF spread.
- with a mask, only `final_df_std` is masked: the full-res mask is
  warped by the *mean* final df at each level and multiplied in before
  the std (evaluate.py:244-248).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pulpo_tpu.models.api import PULPoModel, combine_dfs
from pulpo_tpu.models.pulpo import PULPoModule
from pulpo_tpu.ops.warp import warp_image

LevelDict = dict[int, jnp.ndarray]


class UQResult(NamedTuple):
    mean_outputs: LevelDict       # mean-SVF re-warped prediction (B, *, C)
    avg_dfs: LevelDict            # mean individual df per level
    final_dfs: LevelDict          # final df of the mean SVF per level
    outputs: LevelDict            # per-sample warped outputs (B, N, *, C)
    output_std: LevelDict         # (B, *spatial) channel-averaged
    individual_df_std: LevelDict  # (B, *spatial)
    final_df_std: LevelDict       # (B, *spatial)


def _std_map(x: jnp.ndarray) -> jnp.ndarray:
    """std over the leading sample axis, then mean over channels.

    x: (N, B, *spatial, C) -> (B, *spatial)."""
    return jnp.mean(jnp.std(x, axis=0, ddof=1), axis=-1)


def _uq_impl(model: PULPoModel, variables, x, y, N: int, rng, mask=None,
             chunk: int | None = None):
    cfg = model.cfg
    acts = model.module.apply(variables, x, y, train=False, method=PULPoModule.encode)

    def decode_one(key):
        outs = model.module.apply(
            variables, x, acts, False, False,
            rngs={"sample": key}, method=PULPoModule.decode,
        )
        return outs[4], outs[6], outs[7]  # individual, final, transformed

    keys = jax.random.split(rng, N)
    if chunk is None or chunk >= N:
        ind_dfs, final_dfs_s, outputs_s = jax.vmap(decode_one)(keys)  # (N, B, ...)
    else:
        # bounded-memory sampling: serialize chunks of a vmapped decode
        assert N % chunk == 0, f"N={N} not divisible by chunk={chunk}"
        keys2 = keys.reshape(N // chunk, chunk)
        chunked = jax.lax.map(lambda ks: jax.vmap(decode_one)(ks), keys2)
        merge = lambda d: {
            l: v.reshape(N, *v.shape[2:]) for l, v in d.items()
        }
        ind_dfs, final_dfs_s, outputs_s = (merge(d) for d in chunked)

    # mean-SVF combine + integrate + re-warp
    avg_dfs = {l: v.mean(axis=0) for l, v in ind_dfs.items()}
    _, mean_final = combine_dfs(cfg, avg_dfs)
    mean_outputs = {l: warp_image(x, mean_final[l]) for l in mean_final}

    output_std = {l: _std_map(v) for l, v in outputs_s.items()}
    individual_df_std = {l: _std_map(v) for l, v in ind_dfs.items()}
    if mask is not None:
        final_df_std = {}
        for l, v in final_dfs_s.items():
            wm = warp_image(mask, mean_final[l])  # (B, *lvl_spatial, 1)
            final_df_std[l] = _std_map(v * wm[None])
    else:
        final_df_std = {l: _std_map(v) for l, v in final_dfs_s.items()}

    swap = lambda d: {l: jnp.swapaxes(v, 0, 1) for l, v in d.items()}
    return UQResult(
        mean_outputs=mean_outputs,
        avg_dfs=avg_dfs,
        final_dfs=mean_final,
        outputs=swap(outputs_s),
        output_std=output_std,
        individual_df_std=individual_df_std,
        final_df_std=final_df_std,
    )


@functools.lru_cache(maxsize=None)
def _jitted_uq(model: PULPoModel, N: int, has_mask: bool, chunk: int | None):
    if has_mask:
        return jax.jit(lambda v, x, y, r, m: _uq_impl(model, v, x, y, N, r, m, chunk))
    return jax.jit(lambda v, x, y, r: _uq_impl(model, v, x, y, N, r, None, chunk))


def predict_with_uncertainty(
    model: PULPoModel, variables, x, y, N: int, rng, mask=None,
    chunk: int | None = None,
) -> UQResult:
    """Single fused on-chip program for N-sample UQ prediction.

    `chunk` bounds peak memory by serializing the vmapped decode in
    groups of `chunk` samples (lax.map over N//chunk vmap(chunk) calls).
    """
    if mask is not None:
        return _jitted_uq(model, N, True, chunk)(variables, x, y, rng, mask)
    return _jitted_uq(model, N, False, chunk)(variables, x, y, rng)
