"""On-chip uncertainty quantification.

TPU-native replacement for the reference's host-driven N-sample loop
(`Evaluate.predict` with N>1, evaluate.py:205-280): the N posterior
draws run as one jitted program — per-sample decode, per-sample SVF
composition + integration, and the std reductions fused on-chip.

Memory design: samples are processed in chunks (vmap of size `chunk`
inside a lax.scan); the statistics are **streamed** as sum/sumsq
accumulators, so no (N, full-res) buffer ever materializes unless
`keep_samples` asks for it. `chunk=None` picks an HBM-aware chunk
automatically (see `auto_chunk`). Per-sample outputs are retained only
for the first chunk (figure sample grids) unless `keep_samples`.

Semantics follow the reference's (correct) batched 2D path
(evaluate.py:253-277), applied to 3D:

- mean prediction = integrate the *mean SVF* (average of the N
  individual dfs), then re-warp the moving image (evaluate.py:266-273).
  (The reference's 3D loop at evaluate.py:238 accidentally averages only
  the *last* draw — a bug we do not replicate; see DIVERGENCES.md.)
- per-level std maps over the N samples, channel-averaged, with
  Bessel-corrected std (torch default): evaluate.py:243,275-277.
- per-sample final dfs come from per-sample combine+integrate
  (evaluate.py:268), so `final_df_std` reflects integration.
- with a mask, only `final_df_std` is masked: the full-res mask warped
  by the *mean* final df, multiplied in before the std
  (evaluate.py:244-248). The mask is constant across samples, so
  std(mask * v) == mask * std(v) and it composes with streaming.
- `output_mse` (mean over samples of (moved - y)^2, channel-dropped) is
  also streamed for the variance-error calibration metric
  (evaluate.py:1538).
- `sample_landmarks` (pass `lm`): each posterior draw's final level-0
  df warps the landmarks on-chip, so LM_VAR/LM_NCC use the SAME draws
  as Var/NCC — the coupling the reference gets from retaining
  all_final_dfs (evaluate.py:1547-1556).
- `output_entropy`: per-voxel Gaussian differential entropy
  0.5*ln(2*pi*e*var) of the warped intensity (the "variance/entropy
  maps" capability; variance from the same streamed moments).
"""

from __future__ import annotations

import functools
import math
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pulpo_tpu.models.api import PULPoModel, _warp_levels, combine_dfs
from pulpo_tpu.models.pulpo import PULPoModule
from pulpo_tpu.ops.warp import warp_landmarks

LevelDict = dict[int, jnp.ndarray]


class UQResult(NamedTuple):
    mean_outputs: LevelDict       # mean-SVF re-warped prediction (B, *, C)
    avg_dfs: LevelDict            # mean individual df per level
    final_dfs: LevelDict          # final df of the mean SVF per level
    outputs: LevelDict            # sample outputs, first chunk only (B, n, *, C)
    output_std: LevelDict         # (B, *spatial) channel-averaged
    individual_df_std: LevelDict  # (B, *spatial)
    final_df_std: LevelDict       # (B, *spatial)
    output_mse: LevelDict         # (B, *spatial) mean_N (moved - y)^2
    output_entropy: LevelDict     # (B, *spatial) 0.5*ln(2*pi*e*var)
    # opt-in retention (keep_samples / lm):
    sample_individual_dfs: LevelDict | None  # (N, B, *level, nd)
    sample_combined_dfs: LevelDict | None    # (N, B, *level, nd)
    sample_final_dfs: LevelDict | None       # (N, B, *out, nd)
    sample_outputs: LevelDict | None         # (N, B, *out, C)
    sample_landmarks: jnp.ndarray | None     # (N, B, n_lm, nd)


def _default_hbm_budget() -> float:
    """Usable accelerator memory, with headroom for params + fragments."""
    try:
        stats = jax.devices()[0].memory_stats() or {}
        limit = stats.get("bytes_limit")
        if limit:
            return 0.75 * float(limit)
    except Exception:
        pass
    return 0.75 * 16e9  # v5e-class default


def _per_sample_decode_bytes(cfg, batch: int, dtype_bytes: int) -> int:
    """Decode working-set bytes per posterior sample (the auto_chunk
    sizing model).

    Round-4 recalibration note (VERDICT r3 #7): this is a PERF-
    calibrated model, not an exact memory bound. Measured v5e facts it
    must reproduce at the flagship config (full-res n0=32): the cap it
    yields at B=4 is chunk 2, which the composed bench sweep measured
    OPTIMAL (0.3694-era pairs/s vs 0.3004 at chunk 4 — chunk 4 FITS
    memory but loses on 16-row scan-step efficiency, so the
    conservative byte estimate lands on the right answer); chunk 16 at
    B=2 OOMs by 54M while chunk 8 fits; the B=8 wall is the ENCODE
    working set, not the decode (26.37G/15.75G — address with
    PULPO_UQ_ENCODE_CHUNK, which unlocked B=6 on hardware).
    Dominated by the level-0 latent-resolution feedback/merge conv
    activations (reference pulpo.py:118-125, 235-240): XLA
    materializes the 5*n0-channel concat input padded to the 128-lane
    tile PLUS a layout copy of it (~2 x 1.6 x unpadded)."""
    sizes = list(cfg.input_size)
    for _ in range(cfg.lk_offset):
        sizes = [math.ceil(s / 2) for s in sizes]
    v0 = math.prod(sizes)
    return v0 * batch * (24 * cfg.n0) * dtype_bytes


def retention_bytes(cfg, N: int, batch: int = 1, dtype_bytes: int = 2,
                    with_landmarks: bool = False) -> int:
    """HBM cost of `keep_samples=True`: the scan-stacked per-sample
    individual/combined dfs (level res, compute dtype), final dfs and
    warped outputs (output res, f32 — integration runs in f32)."""
    per_sample = 0
    for l in range(cfg.latent_levels):
        lv = math.prod(cfg.level_sizes[l])
        ov = math.prod(cfg.df_size(l))
        per_sample += 2 * lv * cfg.ndims * dtype_bytes     # ind + comb
        per_sample += ov * cfg.ndims * 4                   # final df
        per_sample += ov * 1 * 4                           # warped output
    del with_landmarks  # negligible (N * n_lm * nd floats)
    return N * batch * per_sample


def auto_chunk(cfg, N: int, batch: int = 1, dtype_bytes: int = 2,
               hbm_budget: float | None = None,
               retained_bytes: int = 0) -> int:
    """HBM-aware sample-chunk selection; always divides N.

    `retained_bytes` (e.g. from `retention_bytes` when keep_samples is
    on) is reserved off the top of the budget before sizing the decode
    working set."""
    per_sample = _per_sample_decode_bytes(cfg, batch, dtype_bytes)
    budget = hbm_budget if hbm_budget is not None else _default_hbm_budget()
    budget = max(budget - retained_bytes, 0.0)
    cap = max(1, int(budget // max(per_sample, 1)))
    for c in range(min(N, cap), 0, -1):
        if N % c == 0:
            return c
    return 1


def decide_keep_samples(cfg, N: int, batch: int = 1, dtype_bytes: int = 2,
                        hbm_budget: float | None = None) -> bool:
    """Budget-driven default for sample retention: keep the reference's
    all_* buffers (evaluate.py:220-235) only when they fit in HBM on top
    of a chunk-1 decode working set; otherwise stream statistics only.
    At full-res N=32 the retained dfs alone are ~3.5 GB - the reason
    this is a decision, not a constant."""
    budget = hbm_budget if hbm_budget is not None else _default_hbm_budget()
    working = _per_sample_decode_bytes(cfg, batch, dtype_bytes)  # chunk >= 1
    return retention_bytes(cfg, N, batch, dtype_bytes) + working <= budget


def _chunk_moments(v: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(chunk, B, *spatial, C) -> per-voxel (mean, M2) over the chunk."""
    v = v.astype(jnp.float32)
    mean = v.mean(0)
    m2 = ((v - mean[None]) ** 2).sum(0)
    return mean, m2


def _combine_moments(a, b, n_a: int, n_b: int):
    """Chan et al. parallel variance combination (numerically stable
    vs naive sum/sumsq, whose cancellation error is sigma^2/mu^2-
    conditioned)."""
    mean_a, m2_a = a
    mean_b, m2_b = b
    n = n_a + n_b
    delta = mean_b - mean_a
    mean = mean_a + delta * (n_b / n)
    m2 = m2_a + m2_b + delta * delta * (n_a * n_b / n)
    return mean, m2


def _finalize_std(moments, n: int, ch_axis: int = -1) -> jnp.ndarray:
    """Bessel std from streamed (mean, M2), then channel mean.
    `ch_axis`: channel axis (1 for CF-layout final-df moments)."""
    _, m2 = moments
    return jnp.mean(jnp.sqrt(jnp.maximum(m2 / (n - 1), 0.0)), axis=ch_axis)


def _finalize_entropy(moments, n: int) -> jnp.ndarray:
    """Gaussian differential entropy from the channel-averaged variance."""
    _, m2 = moments
    var = jnp.mean(jnp.maximum(m2 / (n - 1), 0.0), axis=-1)
    return 0.5 * jnp.log(2.0 * jnp.pi * jnp.e * var + 1e-12)


def _uq_impl(model: PULPoModel, variables, x, y, N: int, rng, mask=None,
             chunk: int | None = None, keep_samples: bool = False, lm=None):
    cfg = model.cfg
    if chunk is None or chunk > N:
        chunk = N
    assert N % chunk == 0, f"N={N} not divisible by chunk={chunk}"
    n_chunks = N // chunk

    # channels-first df pipeline (round 5): per-sample final dfs ride
    # the warp kernels' padded CF layout through integration, resize,
    # the batched image warp AND the streamed moments (pads are zeros;
    # the finalize slices them off) — no per-chunk transpose/pad
    # staging. Mirrors the Autoencoder's own cf_fin gate.
    from pulpo_tpu.ops.warp import cf_fin_active, cf_pipeline_active

    use_cf = (cf_pipeline_active() and cf_fin_active()
              and cfg.df_resolution == "full_res"
              and cfg.ndims == 3 and "transformed" not in cfg.feedback)

    def _cf_to_cl(v):
        """(..., 3, S0, yp, xp) padded CF -> (..., S0, S1, S2, 3)."""
        _, S1, S2 = cfg.input_size
        return jnp.moveaxis(v[..., :S1, :S2], -4, -1)

    # the encode is per-pair independent (eval BN uses running stats),
    # so large batches can stream through it in pair-chunks: the B=8
    # full-res encode's transient working set alone blew HBM (26.37G /
    # 15.75G, PERF.md round 3) while the per-4-pair encode is the
    # well-tested B=4 program. lax.map serializes the chunks; the math
    # per pair is identical (fusion order inside the mapped body may
    # differ from the monolithic encode: measured worst-leaf diff
    # 5.5e-4 on bf16 outputs — rounding-order noise, not semantics).
    from pulpo_tpu import routing

    enc_chunk = int(routing.get("PULPO_UQ_ENCODE_CHUNK"))
    if enc_chunk and x.shape[0] > enc_chunk and x.shape[0] % enc_chunk == 0:
        g = x.shape[0] // enc_chunk

        def enc(xy):
            xx, yy = xy
            return model.module.apply(variables, xx, yy, train=False,
                                      method=PULPoModule.encode)

        resh = lambda a: a.reshape(g, enc_chunk, *a.shape[1:])
        acts_g = jax.lax.map(enc, (resh(x), resh(y)))
        acts = {l: v.reshape(x.shape[0], *v.shape[2:])
                for l, v in acts_g.items()}
    else:
        acts = model.module.apply(variables, x, y, train=False,
                                  method=PULPoModule.encode)

    # one key per posterior sample: draws depend only on (key, level)
    # inside the decode, so chunking is invariant (tests/test_uq.py)
    keys = jax.random.split(rng, N).reshape(n_chunks, chunk)
    batch = x.shape[0]

    def decode_chunk(ks):
        """Samples folded into the batch axis (chunk*B) — plain batched
        convs on the MXU, Pallas-eligible integration, per-pair tensors
        deduped (see Autoencoder.__call__). Leaves return as
        (chunk, B, ...)."""
        outs = model.module.apply(
            variables, x, acts, False, False,
            method=PULPoModule.decode, n_samples=chunk, sample_keys=ks,
            cf_fin=use_cf,
        )
        unfold = lambda d: {
            l: v.reshape(chunk, batch, *v.shape[1:]) for l, v in d.items()}
        return (unfold(outs[4]), unfold(outs[5]),
                unfold(outs[6]), unfold(outs[7]))  # ind, comb, final, moved

    def chunk_stats(ks):
        ind, comb, fin, out = decode_chunk(ks)  # (chunk, B, ...)
        stats = {}
        for name, d in (("ind", ind), ("fin", fin), ("out", out)):
            stats[name] = {l: _chunk_moments(v) for l, v in d.items()}
        # calibration mse only uses the level-0 (full-res) outputs
        # (evaluate.py:1534-1538); other levels have level-res shapes
        stats["mse"] = {
            0: ((out[0].astype(jnp.float32) - y[None].astype(jnp.float32)) ** 2)
            .sum(0)[..., 0]
        }
        retained = {}
        if keep_samples:
            retained["ind"], retained["comb"] = ind, comb
            retained["fin"] = (
                {l: _cf_to_cl(v) for l, v in fin.items()} if use_cf else fin)
            retained["out"] = out
        if lm is not None:
            # same-draw landmark warps: lm is (B, n_lm, nd) in level-0
            # coords; fin[0] is (chunk, B, *out0, nd)
            fin0 = _cf_to_cl(fin[0]) if use_cf else fin[0]
            retained["lm"] = jax.vmap(lambda d: warp_landmarks(lm, d))(fin0)
        return stats, out, retained

    def merge_stats(carry, s, n_carry):
        # Chan combination with a zero-initialized carry is exact for
        # the first chunk (n_carry == 0 -> mean/m2 pass through), so ONE
        # scan body covers every chunk — the decode appears once in the
        # program, halving compile time vs an unrolled first chunk.
        merged = {}
        for name in ("ind", "fin", "out"):
            merged[name] = {
                l: _combine_moments(carry[name][l], s[name][l], n_carry, chunk)
                for l in carry[name]
            }
        merged["mse"] = {l: carry["mse"][l] + s["mse"][l] for l in carry["mse"]}
        return merged

    # shape/zero templates for the streamed stats + first-chunk slot
    stats_shape, out_shape, _ = jax.eval_shape(chunk_stats, keys[0])
    zeros = lambda tree: jax.tree.map(
        lambda a: jnp.zeros(a.shape, a.dtype), tree)

    def body(carry, ks):
        stats_c, first_c, n_c = carry
        s, out, ret = chunk_stats(ks)
        # retain the FIRST chunk's per-sample outputs (figure grids).
        # lax.cond instead of jnp.where: the false branch is the carry
        # identity, which XLA aliases in place — a per-chunk jnp.where
        # re-read and re-wrote the full (chunk, B, *out) slot tree every
        # iteration (~3 GB of HBM traffic per chunk at the flagship
        # config, PERF.md).
        first = jax.lax.cond(
            n_c == 0, lambda o, _: o, lambda _, slot: slot, out, first_c)
        return (merge_stats(stats_c, s, n_c), first, n_c + chunk), ret

    # lax.scan serializes chunks (bounds live memory); the sample count
    # so far rides in the carry for the moment combination. Retained
    # per-sample tensors ride the scan's stacked ys.
    (stats, first_outputs, _), retained = jax.lax.scan(
        body, (zeros(stats_shape), zeros(out_shape), jnp.float32(0.0)), keys)
    retained = jax.tree.map(
        lambda a: a.reshape(-1, *a.shape[2:]), retained)

    # mean-SVF combine + integrate + re-warp (streamed mean == avg df)
    avg_dfs = {l: m[0] for l, m in stats["ind"].items()}
    if use_cf:
        from pulpo_tpu.models.api import combine_dfs_cf
        from pulpo_tpu.ops.warp import batched_level_warp_cf

        _, mean_final_cf = combine_dfs_cf(cfg, avg_dfs)
        mean_outputs = batched_level_warp_cf(x, mean_final_cf,
                                             cfg.input_size)
        mean_final = {l: _cf_to_cl(v) for l, v in mean_final_cf.items()}
    else:
        _, mean_final = combine_dfs(cfg, avg_dfs)
        # full_res: all levels' final dfs share the output shape — one
        # batched warp call for all K levels (ops/warp.batched_level_warp)
        mean_outputs = _warp_levels(x, mean_final)

    output_std = {l: _finalize_std(m, N) for l, m in stats["out"].items()}
    output_entropy = {l: _finalize_entropy(m, N) for l, m in stats["out"].items()}
    individual_df_std = {l: _finalize_std(m, N) for l, m in stats["ind"].items()}
    if use_cf:
        _, S1_, S2_ = cfg.input_size
        final_df_std = {l: _finalize_std(m, N, ch_axis=-4)[..., :S1_, :S2_]
                        for l, m in stats["fin"].items()}
    else:
        final_df_std = {l: _finalize_std(m, N) for l, m in stats["fin"].items()}
    if mask is not None:
        # mask constant across samples: std(mask*v) == mask*std(v)
        wms = _warp_levels(mask, mean_final)
        for l in final_df_std:
            final_df_std[l] = final_df_std[l] * jnp.abs(wms[l][..., 0])

    output_mse = {l: stats["mse"][l] / N for l in stats["mse"]}

    swap = lambda d: {l: jnp.swapaxes(v, 0, 1) for l, v in d.items()}
    return UQResult(
        mean_outputs=mean_outputs,
        avg_dfs=avg_dfs,
        final_dfs=mean_final,
        outputs=swap(first_outputs),
        output_std=output_std,
        individual_df_std=individual_df_std,
        final_df_std=final_df_std,
        output_mse=output_mse,
        output_entropy=output_entropy,
        sample_individual_dfs=retained.get("ind"),
        sample_combined_dfs=retained.get("comb"),
        sample_final_dfs=retained.get("fin"),
        sample_outputs=retained.get("out"),
        sample_landmarks=retained.get("lm"),
    )


@functools.lru_cache(maxsize=None)
def _jitted_uq(model: PULPoModel, N: int, has_mask: bool, chunk: int | None,
               keep_samples: bool, has_lm: bool):
    def f(v, x, y, r, m, lm):
        return _uq_impl(model, v, x, y, N, r, m, chunk,
                        keep_samples=keep_samples, lm=lm)

    jf = jax.jit(f)

    def call(v, x, y, r, m=None, lm=None):
        return jf(v, x, y, r, m, lm)

    return call


def predict_with_uncertainty(
    model: PULPoModel, variables, x, y, N: int, rng, mask=None,
    chunk: int | None = None, keep_samples: bool = False, lm=None,
) -> UQResult:
    """Single fused on-chip program for N-sample UQ prediction.

    `chunk` bounds peak memory: samples stream through a scanned
    vmap(chunk) with sum/sumsq std accumulators; `outputs` holds only
    the first chunk's per-sample warps. `chunk=None` selects an
    HBM-aware chunk via `auto_chunk` (always a divisor of N), so
    full-res N=32 runs on a single chip by default.

    `keep_samples=True` additionally retains per-sample individual /
    combined / final dfs (the reference's all_* buffers,
    evaluate.py:220-235) — costs N full buffers of HBM, opt-in.
    `lm=(B, n_lm, nd)` retains per-sample warped landmarks (tiny).
    """
    if chunk is None:
        dtype_bytes = 2 if model.dtype == jnp.bfloat16 else 4
        retained = (retention_bytes(model.cfg, N, x.shape[0], dtype_bytes)
                    if keep_samples else 0)
        chunk = auto_chunk(model.cfg, N, batch=x.shape[0],
                           dtype_bytes=dtype_bytes, retained_bytes=retained)
    fn = _jitted_uq(model, N, mask is not None, chunk, keep_samples,
                    lm is not None)
    return fn(variables, x, y, rng, mask, lm)
