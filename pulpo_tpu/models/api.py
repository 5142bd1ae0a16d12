"""High-level model API: init, forward, prediction, df composition.

This is the functional equivalent of the reference's PULPo public surface
(src/models.py:312-388): `forward`, `predict`, `predict_deterministic`,
`predict_output_samples`, `combine_dfs`, `transform_segmentation` — with
the TPU-native upgrade that N-sample posterior prediction runs as a
single on-chip `vmap` over the sampled decode path (the down path and
its activations are computed once and broadcast), replacing the
reference's host-driven loop (evaluate.py:213-236).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from pulpo_tpu.config import PULPoConfig
from pulpo_tpu.models.pulpo import PULPoModule, prior_like
from pulpo_tpu.ops.resize import avg_pool_ceil
from pulpo_tpu.ops.warp import (
    batched_level_warp,
    integrate_svf_auto,
    resize_vecfield,
    warp_image,
    warp_image_auto,
)

LevelDict = dict[int, jnp.ndarray]


def _warp_levels(moving: jnp.ndarray, dfs: LevelDict) -> LevelDict:
    """Per-level warps of one moving image, batched into a single
    kernel call when every level's df shares the output shape
    (full_res df_resolution; see ops/warp.batched_level_warp)."""
    if len({dfs[l].shape for l in dfs}) == 1:
        return batched_level_warp(moving, dfs)
    return {l: warp_image_auto(moving, dfs[l]) for l in dfs}


def combine_dfs(
    cfg: PULPoConfig, individual_dfs: LevelDict
) -> tuple[LevelDict, LevelDict]:
    """Coarse->fine accumulate + integrate (reference models.py:349-368).

    Semantics to preserve: the *mean SVF* gets integrated, not the mean
    of integrated fields — callers average `individual_dfs` first.
    """
    combined: LevelDict = {}
    K = cfg.latent_levels
    for l in reversed(range(K)):
        if l + 1 in combined:
            in_sz = individual_dfs[l].shape[1:-1]
            parent_sz = individual_dfs[l + 1].shape[1:-1]
            vel_resize = 1.0 / (in_sz[0] / parent_sz[0])
            combined[l] = individual_dfs[l] + resize_vecfield(
                combined[l + 1], vel_resize, out_size=in_sz
            )
        else:
            combined[l] = individual_dfs[l]

    final: LevelDict = {}
    for l in reversed(range(K)):
        # combine_dfs runs in non-vmapped contexts -> Pallas-eligible
        integ = integrate_svf_auto(combined[l].astype(jnp.float32), nsteps=cfg.nsteps)
        cur_sz = integ.shape[1:-1]
        target = (
            cfg.input_size
            if (l == 0 or cfg.df_resolution == "full_res")
            else cur_sz
        )
        vel_resize = 1.0 / (target[0] / cur_sz[0])
        final[l] = resize_vecfield(integ, vel_resize, out_size=target)
    return combined, final


def combine_dfs_cf(
    cfg: PULPoConfig, individual_dfs: LevelDict
) -> tuple[LevelDict, LevelDict]:
    """`combine_dfs` with the finals emitted in the warp kernels' padded
    channels-first layout (round-5 CF df pipeline; full_res only): the
    mean-SVF tail's K integrations run on the chained CF layout and the
    K re-warps consume the finals with zero staging
    (ops/warp.batched_level_warp_cf). Interiors bit-match
    `combine_dfs`."""
    from pulpo_tpu.kernels.warp_local import (
        cf_chain_applicable,
        cf_interior,
        cf_pad,
        integrate_cf_padded,
    )
    from pulpo_tpu.ops.warp import cf_interpret, resize_vecfield_cf

    assert cfg.df_resolution == "full_res", "CF finals need full_res dfs"
    combined: LevelDict = {}
    K = cfg.latent_levels
    for l in reversed(range(K)):
        if l + 1 in combined:
            in_sz = individual_dfs[l].shape[1:-1]
            parent_sz = individual_dfs[l + 1].shape[1:-1]
            vel_resize = 1.0 / (in_sz[0] / parent_sz[0])
            combined[l] = individual_dfs[l] + resize_vecfield(
                combined[l + 1], vel_resize, out_size=in_sz
            )
        else:
            combined[l] = individual_dfs[l]

    final: LevelDict = {}
    for l in reversed(range(K)):
        cur_sz = combined[l].shape[1:-1]
        if cf_chain_applicable(cur_sz):
            vp = cf_pad(combined[l].astype(jnp.float32))
            vp = integrate_cf_padded(vp, cur_sz, cfg.nsteps, cf_interpret())
            interior = cf_interior(vp, cur_sz)
        else:
            integ = integrate_svf_auto(
                combined[l].astype(jnp.float32), nsteps=cfg.nsteps,
                allow_cf=False)
            interior = jnp.transpose(integ, (0, 4, 1, 2, 3))
        vel_resize = 1.0 / (cfg.input_size[0] / cur_sz[0])
        final[l] = resize_vecfield_cf(interior, vel_resize, cfg.input_size)
    return combined, final


def transform_segmentation(cfg: PULPoConfig, dfs: LevelDict, seg: jnp.ndarray) -> LevelDict:
    """Warp a segmentation pyramid by per-level final dfs
    (models.py:370-388)."""
    if cfg.df_resolution == "full_res":
        level_seg = {l: seg for l in range(cfg.latent_levels)}
    else:
        level_seg = {}
        h = seg
        for _ in range(cfg.lk_offset):
            h = avg_pool_ceil(h)
        prev = h
        for l in range(1, cfg.latent_levels):
            prev = avg_pool_ceil(prev)
            level_seg[l] = prev
        level_seg[0] = seg
    if cfg.df_resolution == "full_res":
        return _warp_levels(seg, dfs)
    return {l: warp_image_auto(level_seg[l], dfs[l]) for l in dfs}


class PULPoModel:
    """Stateless convenience wrapper around PULPoModule.

    Holds config + module; all methods are pure functions of explicit
    `variables` ({'params', 'batch_stats'}) and rng keys, so they can be
    jitted, vmapped and shard_mapped freely.
    """

    def __init__(self, cfg: PULPoConfig, dtype: Any = None, bn_axis_name: str | None = None):
        self.cfg = cfg
        self.dtype = dtype
        self.module = PULPoModule(cfg, dtype=dtype, bn_axis_name=bn_axis_name)
        # install the config-owned kernel routing (env still overrides)
        # and log the resolved table once per distinct state
        from pulpo_tpu import routing as _routing

        _routing.activate(cfg.routing)

    # ------------------------------------------------------------------
    def init(self, rng: jax.Array, batch_size: int = 1):
        cfg = self.cfg

        # one compiled program: eager init would dispatch hundreds of
        # tiny ops, which is pathological on remote/tunneled TPUs
        @functools.partial(jax.jit, static_argnums=1)
        def _init(rng, bs):
            x = jnp.zeros((bs, *cfg.input_size, 1), jnp.float32)
            p_rng, s_rng = jax.random.split(rng)
            return self.module.init(
                {"params": p_rng, "sample": s_rng}, x, x, train=False
            )

        return _init(rng, batch_size)

    # ------------------------------------------------------------------
    def apply_train(self, variables, x, y, rng):
        """Stochastic forward in train mode; returns (outputs8, new_batch_stats)."""
        outs, mutated = self.module.apply(
            variables, x, y, deterministic=False, train=True,
            rngs={"sample": rng}, mutable=["batch_stats"],
        )
        return outs, mutated["batch_stats"]

    def apply_eval(self, variables, x, y, rng=None, deterministic=False):
        rngs = None if deterministic else {"sample": rng}
        return self.module.apply(
            variables, x, y, deterministic=deterministic, train=False, rngs=rngs
        )

    # ------------------------------------------------------------------
    # Public prediction APIs. All jitted (cached per static N): on
    # tunneled/remote TPUs eager op-by-op dispatch is pathological.
    # ------------------------------------------------------------------

    @functools.cached_property
    def _forward_jit(self):
        return jax.jit(lambda v, x, y, r: self.apply_eval(v, x, y, r)[7][0])

    def forward(self, variables, x, y, rng):
        """Stochastic forward, returns the level-0 warped image
        (models.py:339-342)."""
        return self._forward_jit(variables, x, y, rng)

    @functools.cached_property
    def _predict_det_jit(self):
        def f(v, x, y):
            outs = self.apply_eval(v, x, y, deterministic=True)
            return outs[7], outs[4]

        return jax.jit(f)

    def predict_deterministic(self, variables, x, y):
        """Decode posterior means (models.py:333-336);
        returns (transformed, individual_dfs)."""
        return self._predict_det_jit(variables, x, y)

    def _predict_output_samples_impl(self, variables, x, y, N: int, rng):
        acts = self.module.apply(
            variables, x, y, train=False, method=PULPoModule.encode
        )
        # N samples folded into the batch axis (N*B, sample-major) with
        # one key per sample — same draws as the chunked UQ engine
        # (uq/predict.py) for the same rng, whatever the chunking
        keys = jax.random.split(rng, N)
        outs = self.module.apply(
            variables, x, acts, False, False,
            method=PULPoModule.decode, n_samples=N, sample_keys=keys,
        )
        b = x.shape[0]
        swap = lambda d: {
            k: jnp.swapaxes(v.reshape(N, b, *v.shape[1:]), 0, 1)
            for k, v in d.items()}
        return swap(outs[7]), swap(outs[4])

    @functools.cached_property
    def _predict_output_samples_jit(self):
        return jax.jit(self._predict_output_samples_impl, static_argnums=3)

    def predict_output_samples(self, variables, x, y, N: int, rng):
        """N posterior draws, vmapped on-chip. Down path runs once.

        Returns (outputs, individual_dfs) with leading (B, N, ...) axes,
        matching models.py:312-321.
        """
        return self._predict_output_samples_jit(variables, x, y, N, rng)

    def _predict_impl(self, variables, x, y, N: int, rng):
        _, individual_dfs = self._predict_output_samples_impl(variables, x, y, N, rng)
        avg_dfs = {k: v.mean(axis=1) for k, v in individual_dfs.items()}
        _, avg_final = combine_dfs(self.cfg, avg_dfs)
        avg_outputs = _warp_levels(x, avg_final)
        return avg_outputs, avg_dfs

    @functools.cached_property
    def _predict_jit(self):
        return jax.jit(self._predict_impl, static_argnums=3)

    def predict(self, variables, x, y, N: int, rng):
        """Mean-SVF prediction (models.py:323-331): average the N
        individual dfs, combine+integrate once, warp once per level."""
        return self._predict_jit(variables, x, y, N, rng)

    # ------------------------------------------------------------------
    def combine_dfs(self, individual_dfs: LevelDict):
        return combine_dfs(self.cfg, individual_dfs)

    def transform_segmentation(self, dfs: LevelDict, seg: jnp.ndarray):
        return transform_segmentation(self.cfg, dfs, seg)

    def prior(self, posterior_mus, posterior_sigmas):
        return prior_like(posterior_mus, posterior_sigmas)

    # ------------------------------------------------------------------
    @functools.cached_property
    def param_count(self):
        import numpy as np

        variables = jax.eval_shape(lambda: self.init(jax.random.key(0)))
        return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(variables["params"]))
