"""The PULPo hierarchical probabilistic registration network (flax linen).

Architecture mirrors the reference (src/components/pulpo.py):

- DownPath: shared conv encoder over concat(moving, fixed); per global
  level k: ConvSequence(depth=3) then ceil-mode AvgPool/2 (pulpo.py:9-62).
- Autoencoder: hierarchical VAE decoded coarse->fine. At each latent
  level an encoder head produces (mu, sigma), a sample is drawn, and an
  SVF decoder turns it into a velocity field that is composed with the
  upscaled parent field, integrated (scaling & squaring) and used to warp
  the moving-image pyramid (pulpo.py:65-215).
- PULPoEncoder: optional feedback concat + merge ConvSequence + MuSigma
  (pulpo.py:219-263).
- SVFDecoder: VelocityField -> combine (x2 upscale + add) -> VecInt ->
  resize to output -> warp (pulpo.py:265-319).
- Prior: standard normal, shaped like the posterior (pulpo.py:323-340).

Outputs are dicts keyed by latent level (valid jax pytrees). The K-level
loop is unrolled in Python: levels have different static shapes, which is
exactly what XLA wants (one fused graph, no dynamic shapes).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from pulpo_tpu.config import PULPoConfig
from pulpo_tpu.models.blocks import ConvSequence, MuSigmaBlock, VelocityField
from pulpo_tpu.ops.resize import avg_pool_ceil, resize_linear
from pulpo_tpu.ops.warp import (
    batched_level_warp,
    integrate_svf_auto,
    resize_vecfield,
    warp_image,
    warp_image_auto,
)

LevelDict = dict[int, jnp.ndarray]


class DownPath(nn.Module):
    """Shared conv encoder over concat(moving, fixed) (pulpo.py:9-62)."""

    cfg: PULPoConfig
    dtype: Any = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray, train: bool = True) -> LevelDict:
        cfg = self.cfg
        # static_argnums count self: (self, x, train) -> train is 2
        remat_seq = nn.remat(ConvSequence, static_argnums=(2,))
        h = jnp.concatenate([x, y], axis=-1)
        acts: LevelDict = {}
        for k in range(cfg.total_levels):
            if k > 0:
                h = avg_pool_ceil(h)
            # cfg.remat_down: recompute this block in the backward
            # instead of saving its conv/BN/LReLU activations — at full
            # res block 0's saved set (~5 GB/pair bf16) is what caps the
            # training batch size (config.py remat_down note)
            seq_cls = remat_seq if (cfg.remat or k in cfg.remat_down) \
                else ConvSequence
            h = seq_cls(
                cfg.num_channels[k], depth=3, dtype=self.dtype,
                bn_axis_name=self.bn_axis_name, name=f"down_block_{k}",
            )(h, train)
            acts[k] = h
        return acts


class PULPoEncoder(nn.Module):
    """Posterior head for one latent level (pulpo.py:219-263)."""

    cfg: PULPoConfig
    level: int
    dtype: Any = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, down_activation, feedback=None, train: bool = True,
                 y2=None, act_half: bool = False):
        cfg = self.cfg
        num_channels = cfg.num_channels[cfg.lk_offset + self.level]
        if act_half:
            # per-pair half of the merge conv (scan hoisting): the
            # feedback operand is absent, so its width (the up_block
            # output, n0*zdim) sizes the kernel's missing first half
            return ConvSequence(
                num_channels, depth=2, dtype=self.dtype,
                bn_axis_name=self.bn_axis_name, name="sample_merge_block",
            )(down_activation, train, x2_features=cfg.n0 * cfg.zdim,
              act_half=True)
        h = down_activation
        if feedback is not None:
            # split application == ConvSequence(concat([feedback, act]))
            # (reference pulpo.py:235-240) without materializing the
            # 5*n0-channel concat (the dominant HBM temp, PERF.md); when
            # feedback carries folded samples (S*B) and the activation is
            # per-pair (B), the activation half is convolved once per
            # pair (blocks._RawConv) — or hoisted out of the sample scan
            # entirely when the caller passes the precomputed ``y2``
            h = ConvSequence(
                num_channels, depth=2, dtype=self.dtype,
                bn_axis_name=self.bn_axis_name, name="sample_merge_block",
            )(feedback, train, x2=None if y2 is not None else down_activation,
              y2=y2, x2_features=down_activation.shape[-1])
        mu, sigma = MuSigmaBlock(cfg.zdim, dtype=self.dtype, name="mu_sigma")(h)
        return mu, sigma


class SVFDecoder(nn.Module):
    """SVF decoder for one latent level (pulpo.py:265-319)."""

    cfg: PULPoConfig
    level: int
    dtype: Any = None
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, z, input_image, combined_df=None, train: bool = True,
                 do_warp: bool = True, cf_fin: bool = False):
        """``do_warp=False`` skips the final image warp (returns None in
        its slot): at full_res df_resolution every level warps the SAME
        full-res moving image, so the Autoencoder batches all K levels'
        warps into ONE Pallas cascade call after the level loop (K x the
        rows per kernel launch, one tier branch instead of K).

        ``cf_fin=True`` (requires do_warp=False): the channels-first df
        pipeline (round 5) — integration runs on the chained CF layout
        and ``final_df`` is returned in the warp kernels' padded CF
        layout (B, 3, S0, r8(S1), r128(S2)), zero tile pads, straight
        from `resize_vecfield_cf`. No transpose or pad staging exists
        anywhere between the velocity head and the batched image warp.
        """
        cfg = self.cfg
        l = self.level
        insize = cfg.level_sizes[l]
        outsize = cfg.df_size(l)

        individual_df = VelocityField(
            ndims=cfg.ndims, max_channels=cfg.n0, depth=cfg.cp_depth,
            dtype=self.dtype, bn_axis_name=self.bn_axis_name, name="velocity_field",
        )(z, train)

        if combined_df is None:  # coarsest level
            combined = individual_df
        else:
            parent = resize_vecfield(combined_df, vel_resize=0.5, out_size=insize)
            combined = parent + individual_df

        vel_resize_output = 1.0 / (outsize[0] / insize[0])

        if cf_fin:
            assert not do_warp, "cf_fin implies the batched post-loop warp"
            from pulpo_tpu.kernels.warp_local import (
                cf_chain_applicable,
                cf_interior,
                cf_pad,
                integrate_cf_padded,
            )
            from pulpo_tpu.ops.warp import cf_interpret, resize_vecfield_cf

            if cf_chain_applicable(insize):
                vp = cf_pad(combined.astype(jnp.float32))
                vp = integrate_cf_padded(vp, insize, cfg.nsteps,
                                         cf_interpret())
                interior = cf_interior(vp, insize)
            else:
                # thin/coarse levels: CL integration (the stencils skip
                # themselves there anyway), one tiny transpose to CF
                integ = integrate_svf_auto(
                    combined.astype(jnp.float32), nsteps=cfg.nsteps,
                    allow_cf=False)
                interior = jnp.transpose(integ, (0, 4, 1, 2, 3))
            final_df = resize_vecfield_cf(interior, vel_resize_output,
                                          outsize)
            return individual_df, individual_df, combined, final_df, None

        # integration happens in f32 regardless of compute dtype: the
        # 7-step self-warp compounds rounding error. Auto-routed through
        # the Pallas halo stencil on TPU (kernels/warp_local.py) — the
        # decode is sample-batched (never vmapped), so the runtime
        # exactness guard's lax.cond stays a real branch.
        integrated = integrate_svf_auto(
            combined.astype(jnp.float32), nsteps=cfg.nsteps,
            allow_cf=not train)

        final_df = resize_vecfield(integrated, vel_resize_output, out_size=outsize)

        if not do_warp:
            return individual_df, individual_df, combined, final_df, None
        # same-res (level-0 full_res) warps route to the Pallas halo
        # stencil; cross-res level_res warps use the XLA gather
        transformed = warp_image_auto(input_image.astype(jnp.float32), final_df)
        return individual_df, individual_df, combined, final_df, transformed


class Autoencoder(nn.Module):
    """Hierarchical VAE body (pulpo.py:65-215)."""

    cfg: PULPoConfig
    dtype: Any = None
    bn_axis_name: str | None = None

    def setup(self):
        cfg = self.cfg
        # (self, down_act, feedback, train) /
        # (self, z, img, combined, train, do_warp)
        enc_cls = nn.remat(PULPoEncoder, static_argnums=(3,)) if cfg.remat else PULPoEncoder
        dec_cls = nn.remat(SVFDecoder, static_argnums=(4, 5, 6)) if cfg.remat else SVFDecoder
        self.encoders = {
            str(l): enc_cls(cfg, l, self.dtype, self.bn_axis_name, name=f"encoder_{l}")
            for l in range(cfg.latent_levels)
        }
        self.decoders = {
            str(l): dec_cls(cfg, l, self.dtype, self.bn_axis_name, name=f"decoder_{l}")
            for l in range(cfg.latent_levels)
        }
        # feedback merge blocks exist for global levels lk_offset..total-2,
        # i.e. latent levels 0..K-2 (pulpo.py:118-125)
        self.up_blocks = {
            str(l): ConvSequence(
                cfg.n0 * cfg.zdim, depth=2, dtype=self.dtype,
                bn_axis_name=self.bn_axis_name, name=f"up_block_{l + cfg.lk_offset}",
            )
            for l in range(cfg.latent_levels - 1)
        }

    def _level_x_pyramid(self, x: jnp.ndarray) -> LevelDict:
        """Moving-image pyramid; level 0 stays original resolution
        (pulpo.py:167-179)."""
        cfg = self.cfg
        if cfg.df_resolution == "full_res":
            return {l: x for l in range(cfg.latent_levels)}
        level_x: LevelDict = {}
        h = x
        for _ in range(cfg.lk_offset):
            h = avg_pool_ceil(h)
        prev = h
        for l in range(1, cfg.latent_levels):
            prev = avg_pool_ceil(prev)
            level_x[l] = prev
        level_x[0] = x
        return level_x

    def __call__(
        self,
        x: jnp.ndarray,
        down_activations: LevelDict,
        deterministic: bool = False,
        train: bool = True,
        n_samples: int = 1,
        sample_keys: jnp.ndarray | None = None,
        cf_fin: bool = False,
    ) -> tuple[LevelDict, ...]:
        """With ``n_samples=S > 1``, S posterior draws are decoded with
        the samples FOLDED INTO THE BATCH AXIS ((S, B) flattened to S*B,
        sample-major) instead of a vmap over per-sample decodes. This is
        the TPU-native shape for the reference's N-sample loop
        (evaluate.py:213-236): plain batched convs (no batching rules,
        no lax.cond-under-vmap blocking the Pallas VecInt stencil), the
        per-pair tensors (x pyramid, down activations, coarsest-level
        posterior moments, the activation half of every feedback-merge
        conv) are computed ONCE per pair and broadcast, and the moving
        image is never copied per sample (ops/warp.py sample-tiled
        gather).

        ``sample_keys``: (S,) PRNG keys, one per posterior sample. Draws
        depend only on (key, level), so results are invariant to how
        callers chunk S — required by the streaming UQ engine. Mandatory
        when S > 1 and not deterministic.

        (A pair_pre hoisting variant — pair-constant tensors computed
        outside the sample-chunk scan — was measured SLOWER at the
        flagship config, -11%: scan constants re-read from HBM each
        chunk. Removed round 4; PERF.md keeps the A/B.)
        """
        cfg = self.cfg
        S = n_samples
        B = x.shape[0]
        level_x = self._level_x_pyramid(x)
        # at full_res every level warps the SAME full-res moving image
        # with a same-shaped full-res df: batch all K warps into one
        # kernel call after the level loop (see batched_level_warp) —
        # unless finer levels consume `transformed` as feedback DURING
        # the loop, which forces the per-level warp order
        batch_warp = (cfg.df_resolution == "full_res"
                      and "transformed" not in cfg.feedback)
        # channels-first final-df pipeline (round 5): only meaningful
        # with the post-loop batched warp; final_dfs leave in the warp
        # kernels' padded CF layout and the image warp consumes them
        # with zero staging
        cf_fin = cf_fin and batch_warp

        def tile(v):
            """(B, ...) per-pair -> (S*B, ...) sample-major broadcast."""
            if S == 1:
                return v
            return jnp.broadcast_to(v[None], (S, *v.shape)).reshape(
                S * v.shape[0], *v.shape[1:])

        def draw_eps(l: int, shape: tuple[int, ...], dtype) -> jnp.ndarray:
            if S == 1 and sample_keys is None:
                return jax.random.normal(
                    self.make_rng("sample"), shape, jnp.float32).astype(dtype)
            assert sample_keys is not None, "n_samples > 1 needs sample_keys"
            per = (B, *shape[1:])
            eps = jax.vmap(
                lambda k: jax.random.normal(
                    jax.random.fold_in(k, l), per, jnp.float32)
            )(sample_keys)
            return eps.reshape(shape).astype(dtype)

        mus: LevelDict = {}
        sigmas: LevelDict = {}
        samples: LevelDict = {}
        velocity_fields: LevelDict = {}
        individual_dfs: LevelDict = {}
        combined_dfs: LevelDict = {}
        final_dfs: LevelDict = {}
        transformed: LevelDict = {}

        tensors = {
            "samples": samples,
            "velocity_fields": velocity_fields,
            "individual_dfs": individual_dfs,
            "combined_dfs": combined_dfs,
            "final_dfs": final_dfs,
            "transformed": transformed,
        }

        for l in reversed(range(cfg.latent_levels)):
            k = l + cfg.lk_offset
            if l == cfg.latent_levels - 1:
                # coarsest level: the posterior head sees only the (per-
                # pair) down activation — compute it once and broadcast
                mu_pp, sigma_pp = self.encoders[str(l)](
                    down_activations[k], None, train)
                mus[l], sigmas[l] = tile(mu_pp), tile(sigma_pp)
                parent_combined = None
            else:
                down_size = down_activations[k].shape[1:-1]
                # Concat consecutive same-size feedback tensors BEFORE
                # resizing: one wide interpolation instead of six
                # 3-channel ones (XLA picks catastrophic 42x-padded
                # layouts for the narrow per-tensor copies). Run-length
                # grouping preserves the reference's channel order
                # (pulpo.py:195-206) for weight-ported parity.
                runs: list[list] = []
                for item in cfg.feedback:
                    t = tensors[item][l + 1]
                    if runs and runs[-1][0].shape[1:-1] == t.shape[1:-1]:
                        runs[-1].append(t)
                    else:
                        runs.append([t])
                resized = [
                    resize_linear(
                        ts[0] if len(ts) == 1 else jnp.concatenate(ts, axis=-1),
                        down_size,
                    )
                    for ts in runs
                ]
                fb = resized[0] if len(resized) == 1 else jnp.concatenate(resized, axis=-1)
                # fused whole-posterior-head MXU kernel (kernels/
                # pos_head.py): up_block + split merge + mu/sigma heads
                # in one Pallas call with 3-channel seams. Eval only
                # (BN running stats); opt-in via PULPO_FUSED_POSTHEAD
                # until the composed flagship A/B lands.
                from pulpo_tpu.kernels.pos_head import (
                    pos_head_mode,
                    posterior_head,
                )

                mode = (
                    None
                    if train or self.is_initializing()
                    or "batch_stats" not in self.variables
                    else pos_head_mode(fb, cfg.n0 * cfg.zdim,
                                       cfg.num_channels[k], cfg.zdim)
                )
                if mode:
                    y2 = self.encoders[str(l)](
                        down_activations[k], train=train, act_half=True)
                    dt = self.dtype or fb.dtype
                    mus[l], sigmas[l] = posterior_head(
                        fb.astype(dt), y2, self._pos_head_params(l),
                        mode == "interp")
                else:
                    fb = self.up_blocks[str(l)](fb, train=train)
                    mus[l], sigmas[l] = self.encoders[str(l)](
                        down_activations[k], fb, train)
                parent_combined = combined_dfs[l + 1]

            if deterministic:
                samples[l] = mus[l]
                z = mus[l]
            else:
                eps = draw_eps(l, mus[l].shape, mus[l].dtype)
                samples[l] = mus[l] + sigmas[l] * eps
                z = samples[l]

            (
                velocity_fields[l],
                individual_dfs[l],
                combined_dfs[l],
                final_dfs[l],
                transformed[l],
            ) = self.decoders[str(l)](z, level_x[l], parent_combined, train,
                                      not batch_warp, cf_fin)

        if batch_warp:
            if cf_fin:
                from pulpo_tpu.ops.warp import batched_level_warp_cf

                transformed.update(batched_level_warp_cf(
                    x, final_dfs, x.shape[1:-1]))
            else:
                transformed.update(batched_level_warp(x, final_dfs))

        return (
            mus, sigmas, samples, velocity_fields,
            individual_dfs, combined_dfs, final_dfs, transformed,
        )

    def _pos_head_params(self, l: int) -> dict:
        """Parameter dict for kernels/pos_head.posterior_head, read
        straight from this module's bound variables (the flax children
        are only executed on the XLA path — and at init, which creates
        them). mk1 is the feedback half of the split merge kernel
        (models/blocks._RawConv: x = feedback comes first)."""
        cfg = self.cfg
        k = l + cfg.lk_offset
        v = self.variables
        pp, bs = v["params"], v["batch_stats"]

        def unit(tree, btree, pre, n):
            cu = tree[f"ConvUnit_{n - 1}"]
            cv = cu["TorchConv_0"]["Conv_0"]
            bn = cu["BatchNorm_0"]
            b = btree[f"ConvUnit_{n - 1}"]["BatchNorm_0"]
            return {f"{pre}k{n}": cv["kernel"], f"{pre}b{n}": cv["bias"],
                    f"{pre}mean{n}": b["mean"], f"{pre}var{n}": b["var"],
                    f"{pre}scale{n}": bn["scale"],
                    f"{pre}bias{n}": bn["bias"]}

        up, bup = pp[f"up_block_{k}"], bs[f"up_block_{k}"]
        enc, benc = pp[f"encoder_{l}"], bs[f"encoder_{l}"]
        mg, bmg = enc["sample_merge_block"], benc["sample_merge_block"]
        p = {**unit(up, bup, "u", 1), **unit(up, bup, "u", 2),
             **unit(mg, bmg, "m", 1), **unit(mg, bmg, "m", 2)}
        p["mk1"] = p["mk1"][..., :cfg.n0 * cfg.zdim, :]
        ms = enc["mu_sigma"]
        p["hkmu"] = ms["conv_mu"]["Conv_0"]["kernel"]
        p["hbmu"] = ms["conv_mu"]["Conv_0"]["bias"]
        p["hksig"] = ms["conv_sigma"]["Conv_0"]["kernel"]
        p["hbsig"] = ms["conv_sigma"]["Conv_0"]["bias"]
        return p


def prior_like(posterior_mus: LevelDict, posterior_sigmas: LevelDict):
    """Standard-normal prior moments shaped like the posterior
    (pulpo.py:323-340)."""
    prior_mus = {l: jnp.zeros_like(m) for l, m in posterior_mus.items()}
    prior_sigmas = {l: jnp.ones_like(s) for l, s in posterior_sigmas.items()}
    return prior_mus, prior_sigmas


class PULPoModule(nn.Module):
    """Full network: DownPath + Autoencoder (reference model body,
    src/models.py:76-94 construction, 134-146 forward)."""

    cfg: PULPoConfig
    dtype: Any = None
    bn_axis_name: str | None = None

    def setup(self):
        self.downpath = DownPath(self.cfg, self.dtype, self.bn_axis_name)
        self.autoencoder = Autoencoder(self.cfg, self.dtype, self.bn_axis_name)

    def __call__(self, x, y, deterministic: bool = False, train: bool = True):
        acts = self.downpath(x, y, train=train)
        return self.autoencoder(x, acts, deterministic=deterministic, train=train)

    def encode(self, x, y, train: bool = False):
        return self.downpath(x, y, train=train)

    def decode(self, x, down_activations, deterministic=False,
               train: bool = False, n_samples: int = 1, sample_keys=None,
               cf_fin: bool = False):
        """Decode (optionally S posterior samples folded into the batch
        axis, see Autoencoder.__call__). Output leaves are (S*B, ...),
        sample-major — reshape(S, B, ...) recovers the sample axis.
        ``cf_fin=True``: final_dfs leave in the channels-first padded
        layout (UQ engine routing; see SVFDecoder)."""
        return self.autoencoder(x, down_activations, deterministic, train,
                                n_samples=n_samples, sample_keys=sample_keys,
                                cf_fin=cf_fin)
