"""Jitted training / evaluation steps.

Replaces the reference's Lightning training_step / validation_step /
configure_optimizers (src/models.py:134-310, 398-400) with pure jitted
functions: loss = beta*KL + recon + reg, Adam(lr), and the NaN guard
(models.py:188-194) surfaced as a `nan_flag` metric the host loop acts
on (emergency checkpoint + stop).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from pulpo_tpu.config import PULPoConfig
from pulpo_tpu.models.api import PULPoModel, transform_segmentation
from pulpo_tpu.models.pulpo import prior_like
from pulpo_tpu.ops import losses as L


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    rng: jax.Array
    # sticky on-device NaN latch: once a step trips the guard, every
    # later step is a frozen no-op, so the host may detect the NaN
    # asynchronously (steps late) without losing the pre-NaN state
    nan_flag: jnp.ndarray = struct.field(
        default_factory=lambda: jnp.zeros((), jnp.bool_))


def create_train_state(model: PULPoModel, seed: int = 0) -> tuple[TrainState, optax.GradientTransformation]:
    rng = jax.random.key(seed)
    init_rng, state_rng = jax.random.split(rng)
    variables = model.init(init_rng, batch_size=model.cfg.batch_size)
    tx = optax.adam(model.cfg.lr)  # Adam, no schedule/decay/clip (models.py:398-400)
    opt_state = tx.init(variables["params"])
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=opt_state,
        rng=state_rng,
    )
    return state, tx


def compute_losses(
    cfg: PULPoConfig,
    outs: tuple,
    x: jnp.ndarray,
    y: jnp.ndarray,
    seg_x: jnp.ndarray | None,
    seg_y: jnp.ndarray | None,
):
    """beta*KL + recon + reg with per-level breakdowns (models.py:148-165)."""
    (post_mus, post_sigmas, _samples, _vf, _ind, _comb, final_dfs, y_hat) = outs
    prior_mus, prior_sigmas = prior_like(post_mus, post_sigmas)

    if "dice" in cfg.recon_loss:
        y_hat_seg = transform_segmentation(cfg, final_dfs, seg_x)
    else:
        y_hat_seg = None

    kl_loss, kl_levels = L.hierarchical_kl_loss(
        prior_mus, prior_sigmas, post_mus, post_sigmas,
        cfg.kl_weight_dict, nondiagonal=cfg.nondiagonal,
        prior_lambda=cfg.prior_lambda,
    )
    kl_loss = kl_loss * cfg.beta
    kl_levels = {l: cfg.beta * v for l, v in kl_levels.items()}

    recon_loss, recon_levels = L.hierarchical_reconstruction_loss(
        y_hat, y, cfg.recon_weight_dict, cfg.recon_loss, cfg.window_size,
        gamma=cfg.gamma, dice_factor=cfg.dice_factor,
        y_hat_seg=y_hat_seg, seg_y=seg_y,
    )
    reg_loss, reg_levels = L.hierarchical_regularization(
        final_dfs, cfg.regularization_weight_dict,
        regularizer=cfg.regularizer, lamb=cfg.lamb,
    )
    total = kl_loss + recon_loss + reg_loss

    metrics = {
        "kl_loss": kl_loss,
        "reconstruction_loss": recon_loss,
        "regularization_loss": reg_loss,
        "total_loss": total,
        "levels/kl": kl_levels,
        "levels/recon": recon_levels,
        "levels/reg": reg_levels,
        "levels/mean_posterior_mu": {l: jnp.mean(v) for l, v in post_mus.items()},
        "levels/mean_posterior_sigma": {l: jnp.mean(v) for l, v in post_sigmas.items()},
        # NaN guard (models.py:188-194): NaN in any level's reg loss
        "nan_flag": sum(
            jnp.sum(jnp.isnan(v).astype(jnp.int32)) for v in reg_levels.values()
        ) > 0,
    }
    return total, metrics


def make_train_step(model: PULPoModel, tx: optax.GradientTransformation, axis_name: str | None = None):
    """Build the jitted SGD step. If axis_name is set the step is meant to
    run inside shard_map/pmap-style SPMD and gradients are psum-averaged
    over that mesh axis."""
    cfg = model.cfg

    def loss_fn(params, batch_stats, batch, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        outs, new_bs = model.apply_train(variables, batch["x"], batch["y"], rng)
        total, metrics = compute_losses(
            cfg, outs, batch["x"], batch["y"], batch.get("seg_x"), batch.get("seg_y")
        )
        return total, (new_bs, metrics)

    def train_step(state: TrainState, batch):
        rng, sample_rng = jax.random.split(state.rng)
        if axis_name is not None:
            # decorrelate posterior samples across DP replicas
            sample_rng = jax.random.fold_in(sample_rng, jax.lax.axis_index(axis_name))
        grads, (new_bs, metrics) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, batch, sample_rng
        )
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            metrics = jax.tree.map(
                lambda m: jax.lax.pmean(m.astype(jnp.float32), axis_name)
                if jnp.issubdtype(m.dtype, jnp.floating) or m.dtype == jnp.bool_
                else m,
                metrics,
            )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # NaN guard (models.py:188-194): the reference dumps the state
        # *entering* the NaN step (torch.save before the optimizer step).
        # We freeze params/opt/batch_stats on a STICKY flag (OR over all
        # steps so far), so the state the host later checkpoints is
        # exactly the pre-NaN one however late the flag is fetched
        # (train/loop.py reads it asynchronously, one step behind).
        flag = jnp.logical_or(state.nan_flag, metrics["nan_flag"])
        metrics["nan_flag"] = flag
        keep = lambda old, new: jax.tree.map(
            lambda o, n: jnp.where(flag, o, n.astype(o.dtype)), old, new)
        new_state = state.replace(
            step=state.step + 1,
            params=keep(state.params, new_params),
            batch_stats=keep(state.batch_stats, new_bs),
            opt_state=keep(state.opt_state, new_opt),
            rng=rng,
            nan_flag=flag,
        )
        return new_state, metrics

    return train_step


def make_eval_step(model: PULPoModel):
    """Validation: same losses, eval-mode BatchNorm, still stochastic
    sampling (the reference's validation_step samples too)."""
    cfg = model.cfg

    @functools.partial(jax.jit, donate_argnums=())
    def eval_step(params, batch_stats, batch, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        outs = model.apply_eval(variables, batch["x"], batch["y"], rng)
        total, metrics = compute_losses(
            cfg, outs, batch["x"], batch["y"], batch.get("seg_x"), batch.get("seg_y")
        )
        # outputs for periodic image logging (models.py:258-308):
        # main panel (level 0) + per-level recon / individual / final dfs
        metrics_imgs = {
            "y_pred": outs[7][0],
            "final_df": outs[6][0],
            "levels/y_hat": outs[7],
            "levels/individual_dfs": outs[4],
            "levels/final_dfs": outs[6],
        }
        return metrics, metrics_imgs

    return eval_step
