"""Training orchestration: the jit/step loop replacing Lightning.

Reference behavior being reproduced (train.py:106-116 + models.py hooks):
- validation every `val_check_interval` fraction of an epoch (0.1),
- scalar logging every `log_every_n_steps` (5) + per-level stats,
- periodic validation image panels (every `image_logging_frequency`
  validation rounds; models.py:258-308),
- two best-checkpoint policies (val/total_loss, val/reconstruction_loss),
- NaN guard: emergency checkpoint + stop on NaN regularization loss
  (models.py:188-194),
- run directory layout runs/<experiment>/version_<v>.

TPU-native additions: donated train state (no reallocation per step),
background host->device prefetch, optional data-parallel mesh (see
pulpo_tpu/parallel), jax.profiler trace hooks.
"""

from __future__ import annotations

import pathlib
import time
from typing import Any

import jax
import numpy as np

from pulpo_tpu.config import PULPoConfig
from pulpo_tpu.data.loader import prefetch_to_device
from pulpo_tpu.models.api import PULPoModel
from pulpo_tpu.train.checkpoint import CheckpointManager
from pulpo_tpu.train.metrics import MetricWriter
from pulpo_tpu.train.step import create_train_state, make_eval_step, make_train_step


def _host_metrics(metrics: Any) -> dict:
    return jax.tree.map(lambda v: np.asarray(v), jax.device_get(metrics))


class Trainer:
    def __init__(
        self,
        cfg: PULPoConfig,
        run_dir: str | None = None,
        experiment: str = "default",
        profile_dir: str | None = None,
    ):
        self.cfg = cfg
        base = pathlib.Path(run_dir or cfg.run_dir) / experiment
        version = 0
        while (base / f"version_{version}").exists():
            version += 1
        self.run_dir = base / f"version_{version}"
        self.run_dir.mkdir(parents=True)
        self.version = version
        self.profile_dir = profile_dir

        import jax.numpy as jnp

        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
        self.mesh = None
        if cfg.data_parallel > 1:
            from pulpo_tpu.parallel.mesh import make_mesh

            self.mesh = make_mesh(cfg.data_parallel)
        self.model = PULPoModel(
            cfg, dtype=dtype,
            bn_axis_name="data" if self.mesh is not None else None)
        self.writer = MetricWriter(self.run_dir)
        self.ckpt = CheckpointManager(self.run_dir, cfg)
        self.should_stop = False
        self.validation_counter = 0

    # ------------------------------------------------------------------
    def fit(self, train_loader, val_loader, max_steps: int | None = None,
            resume: bool = False):
        cfg = self.cfg
        if cfg.debug_nans:
            jax.config.update("jax_debug_nans", True)
        state, tx = create_train_state(self.model, seed=cfg.random_seed)
        if resume:
            # preemption recovery: restore the latest checkpoint in place
            state = self.ckpt.restore(jax.device_get(state), name="latest")
            state = jax.device_put(state)
            print(f"resumed from step {int(state.step)}")
        if self.mesh is not None:
            from pulpo_tpu.parallel.dp import make_dp_train_step, replicate_state
            from pulpo_tpu.parallel.mesh import shard_batch_spec

            state = replicate_state(state, self.mesh)
            train_step = make_dp_train_step(self.model, tx, self.mesh)
            self._batch_sharding = shard_batch_spec(self.mesh)
        else:
            train_step = jax.jit(make_train_step(self.model, tx), donate_argnums=0)
            self._batch_sharding = None
        eval_step = make_eval_step(self.model)

        steps_per_epoch = len(train_loader)
        val_every = max(1, int(steps_per_epoch * cfg.val_check_interval))
        step = int(jax.device_get(state.step))  # nonzero after resume
        t_start = time.time()
        pending = None  # (step, metrics) fetched one step late to avoid sync
        prev_flag = None  # previous step's nan_flag (device scalar)

        for epoch in range(cfg.max_epochs):
            for batch in prefetch_to_device(
                iter(train_loader), sharding=self._batch_sharding
            ):
                if self.profile_dir and step == 10:
                    jax.profiler.start_trace(self.profile_dir)
                if self.profile_dir and step == 13:
                    jax.profiler.stop_trace()

                if not self.should_stop:
                    state, metrics = train_step(state, batch)
                    step += 1

                    # NaN guard (models.py:188-194), checked EVERY step
                    # like the reference — but asynchronously: the
                    # previous step's flag is inspected AFTER this step
                    # has been dispatched, so the host never stalls the
                    # device pipeline. The flag is sticky on-device and
                    # the step freezes params/opt on it (train/step.py),
                    # so any step dispatched past the NaN is a frozen
                    # no-op and the emergency dump is the pre-NaN state.
                    if prev_flag is not None and bool(jax.device_get(prev_flag)):
                        print("NAN IN REGULARIZATION LOSS")
                        self.ckpt.save_emergency(state, step)
                        self.should_stop = True
                    prev_flag = metrics["nan_flag"]
                    try:  # start the host copy without blocking
                        prev_flag.copy_to_host_async()
                    except AttributeError:
                        pass

                    if pending is not None:
                        self._log_train(*pending)
                        pending = None
                    if step % cfg.log_every_n_steps == 0:
                        m = _host_metrics(metrics)  # syncs; amortized over N steps
                        pending = (step, m)

                    if step % val_every == 0:
                        val_metrics = self._validate(eval_step, state, val_loader, step)
                        self.ckpt.update_best(state, step, val_metrics)
                        self.ckpt.save_latest(state, step)

                if self.should_stop or (max_steps and step >= max_steps):
                    break
            if self.should_stop or (max_steps and step >= max_steps):
                break

        # the final flag may not have been inspected inside the loop
        if (not self.should_stop and prev_flag is not None
                and bool(jax.device_get(prev_flag))):
            print("NAN IN REGULARIZATION LOSS")
            self.ckpt.save_emergency(state, step)
        if pending is not None:  # flush the last pending train log
            self._log_train(*pending)
        self.writer.flush()
        elapsed = time.time() - t_start
        print(f"training finished: {step} steps in {elapsed:.1f}s "
              f"({step / max(elapsed, 1e-9):.2f} steps/s)")
        self.state = state
        return state

    # ------------------------------------------------------------------
    def _log_train(self, step: int, m: dict):
        self.writer.scalars(
            {k: v for k, v in m.items() if not isinstance(v, dict) and k != "nan_flag"},
            step, prefix="train/",
        )
        for group in ("levels/kl", "levels/recon", "levels/reg"):
            self.writer.scalars({str(l): v for l, v in m[group].items()},
                                step, prefix=f"train_{group}/")
        # per-level posterior moment means (models.py:182-186)
        for group in ("levels/mean_posterior_mu", "levels/mean_posterior_sigma"):
            if group in m:
                self.writer.scalars({str(l): v for l, v in m[group].items()},
                                    step, prefix=f"train_distribution_{group}/")

    def _validate(self, eval_step, state, val_loader, step: int) -> dict:
        cfg = self.cfg
        self.validation_counter += 1
        agg: dict[str, list] = {}
        last_imgs = None
        last_batch = None
        rng = jax.random.key(cfg.random_seed + self.validation_counter)
        for i, batch in enumerate(prefetch_to_device(iter(val_loader))):
            rng, sub = jax.random.split(rng)
            metrics, imgs = eval_step(state.params, state.batch_stats, batch, sub)
            m = _host_metrics(metrics)
            for k, v in m.items():
                if not isinstance(v, dict) and k != "nan_flag":
                    agg.setdefault(k, []).append(float(v))
            last_imgs, last_batch = imgs, batch
        val_metrics = {k: float(np.mean(v)) for k, v in agg.items()}
        self.writer.scalars(val_metrics, step, prefix="val/")

        if (
            last_imgs is not None
            and self.validation_counter % max(1, cfg.image_logging_frequency) == 0
        ):
            imgs = _host_metrics(last_imgs)
            self.writer.log_validation_images(
                "val", np.asarray(last_batch["x"]), np.asarray(last_batch["y"]),
                imgs["y_pred"], imgs["final_df"], step,
            )
            self.writer.log_level_images(
                "val_levels", imgs["levels/y_hat"],
                imgs["levels/individual_dfs"], imgs["levels/final_dfs"], step,
            )
        return val_metrics
