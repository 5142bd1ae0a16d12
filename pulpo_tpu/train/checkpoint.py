"""Orbax checkpointing with the reference's two-best policy.

Mirrors train.py:93-102: one checkpoint tracking best val/total_loss and
one tracking best val/reconstruction_loss, plus `latest` for preemption
resume and `nan_state` for the NaN guard dump (models.py:188-194).
Config is stored alongside (reference embeds hparams in the ckpt via
save_hyperparameters, models.py:53) so restore needs no arguments.
"""

from __future__ import annotations

import json
import os
import pathlib
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from pulpo_tpu.config import PULPoConfig


class CheckpointManager:
    def __init__(self, run_dir: str | os.PathLike, cfg: PULPoConfig):
        self.run_dir = pathlib.Path(run_dir).absolute()
        self.run_dir.mkdir(parents=True, exist_ok=True)
        self.cfg = cfg
        self._ckptr = ocp.StandardCheckpointer()
        self.best = {"total_loss": float("inf"), "reconstruction_loss": float("inf")}
        (self.run_dir / "config.json").write_text(cfg.to_json())
        # resolved kernel-routing table alongside the config: the
        # routing that trained a checkpoint is reproducible state
        # (VERDICT r4 #8)
        from pulpo_tpu import routing as _routing

        (self.run_dir / "kernel_routing.json").write_text(
            json.dumps(_routing.resolved_table(), indent=1))
        self._meta_path = self.run_dir / "checkpoints.json"
        if self._meta_path.exists():
            self.best.update(json.loads(self._meta_path.read_text()).get("best", {}))

    def _save(self, name: str, state: Any, step: int):
        path = self.run_dir / "checkpoints" / name
        if path.exists():
            import shutil

            shutil.rmtree(path)
        self._ckptr.save(path, jax.device_get(state))
        self._ckptr.wait_until_finished()
        meta = {"best": self.best, "step": step}
        self._meta_path.write_text(json.dumps(meta))

    def save_latest(self, state, step: int):
        self._save("latest", state, step)

    def save_emergency(self, state, step: int, name: str = "nan_state"):
        """NaN-guard dump (reference saves nan_state_dict.pt,
        models.py:192)."""
        self._save(name, state, step)

    def update_best(self, state, step: int, val_metrics: dict[str, float]):
        """Save best-total-loss / best-reconstruction-loss checkpoints."""
        saved = []
        for key, ckname in (
            ("total_loss", "best-total-loss"),
            ("reconstruction_loss", "best-reconstruction-loss"),
        ):
            v = float(val_metrics[key])
            if np.isfinite(v) and v < self.best[key]:
                self.best[key] = v
                self._save(ckname, state, step)
                saved.append(ckname)
        return saved

    def restore(self, state_template: Any, name: str = "latest"):
        path = self.run_dir / "checkpoints" / name
        return self._ckptr.restore(path, state_template)

    @staticmethod
    def load_config(run_dir) -> PULPoConfig:
        return PULPoConfig.from_json(
            (pathlib.Path(run_dir) / "config.json").read_text()
        )


def latest_run(base_dir, experiment: str | None = None) -> pathlib.Path | None:
    """Find the newest version_* dir (reference's runs/<exp>/version_<v>)."""
    base = pathlib.Path(base_dir)
    if experiment:
        base = base / experiment
    if not base.exists():
        return None
    versions = sorted(
        (p for p in base.glob("**/version_*") if p.is_dir()),
        key=lambda p: p.stat().st_mtime,
    )
    return versions[-1] if versions else None
