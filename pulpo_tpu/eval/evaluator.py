"""The evaluation & analysis suite (reference: evaluate.py, class
Evaluate).

Drives a trained model through visualizations, deterministic performance
tables and N-sample uncertainty tables, using the on-chip UQ path
instead of the reference's host-side sample loop.

Output layout mirrors the reference: <run_dir>/evaluation/{vis, jdet,
loss, uncertainty}/...
"""

from __future__ import annotations

import os
import pathlib
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from pulpo_tpu.config import PULPoConfig
from pulpo_tpu.eval import metrics as M
from pulpo_tpu.eval.artifact import artifact as artifact_fn
from pulpo_tpu.eval.tables import make_tables, table_jdet
from pulpo_tpu.models.api import PULPoModel
from pulpo_tpu.ops import losses as L
from pulpo_tpu.ops.warp import warp_image_auto, warp_landmarks
from pulpo_tpu.uq.predict import predict_with_uncertainty


def _pad_landmarks(lm: jnp.ndarray, bucket: int = 32) -> jnp.ndarray:
    """Zero-pad (B, n_lm, nd) landmarks up to the next `bucket` multiple.

    Keeps the jitted UQ program's traced shape fixed across subjects with
    different landmark counts (each distinct n_lm would otherwise
    recompile the full program). Zero coordinates are valid gather
    indices; callers slice the first n_lm rows off the result.
    """
    n = lm.shape[1]
    target = -(-max(n, 1) // bucket) * bucket
    if target == n:
        return lm
    return jnp.pad(lm, ((0, 0), (0, target - n), (0, 0)))


class Evaluate:
    """Evaluation driver (reference evaluate.py:31-59)."""

    def __init__(self, checkpoint_name: str = "best-reconstruction-loss"):
        self.checkpoint_name = checkpoint_name
        self.model: PULPoModel | None = None
        self.variables = None
        self.latent_levels = None
        self.segs = False
        self.lms = False
        self.mask = False
        self.output_dir = None
        self.rng = jax.random.key(0)

    # ------------------------------------------------------------------
    # Loading
    # ------------------------------------------------------------------

    def load_model(self, run_dir) -> PULPoModel:
        """Load config + best-reconstruction checkpoint from a run dir
        (reference globs checkpoints/best-reconstruction*, evaluate.py:33,
        91-111)."""
        # local imports: pulpo_tpu.train pulls in the metric writer which
        # imports back into pulpo_tpu.eval (avoid the import cycle)
        from pulpo_tpu.train.checkpoint import CheckpointManager
        from pulpo_tpu.train.step import create_train_state

        run_dir = pathlib.Path(run_dir)
        cfg = CheckpointManager.load_config(run_dir)
        model = PULPoModel(cfg)
        state, _ = create_train_state(model, seed=cfg.random_seed)
        ckpt = CheckpointManager(run_dir, cfg)
        name = self.checkpoint_name
        if not (run_dir / "checkpoints" / name).exists():
            name = "latest"
        state = ckpt.restore(jax.device_get(state), name=name)
        self.variables = {"params": state.params, "batch_stats": state.batch_stats}
        self.model = model
        self.latent_levels = cfg.latent_levels
        self.output_dir = run_dir / "evaluation"
        self.output_dir.mkdir(exist_ok=True)
        return model

    def set_model(self, model: PULPoModel, variables, output_dir="evaluation_out"):
        """Use an in-memory model (no checkpoint round-trip)."""
        self.model = model
        self.variables = variables
        self.latent_levels = model.cfg.latent_levels
        self.output_dir = pathlib.Path(output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        return model

    def load_data(self, task, segs, lms, mask, ndims=3, path=None):
        """Build loaders + metric lists (evaluate.py:120-159)."""
        self.segs, self.lms, self.mask = segs, lms, mask
        self.task = task
        if task == "oasis":
            from pulpo_tpu.data.oasis import create_data_loaders

            loaders = create_data_loaders(1, segs=segs, lms=lms, mask=mask,
                                          ndims=ndims, path=path)
            self.loaders = list(loaders)
            self.loader_names = ["train", "val", "test_seg", "test_lm"]
        elif task == "brats":
            from pulpo_tpu.data.brats import create_data_loaders

            loaders = create_data_loaders(1, segs=segs, lms=lms, mask=mask,
                                          ndims=ndims, path=path)
            self.loaders = list(loaders)
            self.loader_names = ["train", "val", "test"]
        elif task == "lungct":
            from pulpo_tpu.data.lungct import create_data_loaders

            # inspiration/expiration fields displace tens of voxels:
            # enable the coarse-offset warp tier (24-36x over the
            # gather fallback in that regime, PERF.md; opt-in on other
            # tasks because compiling the extra branch costs -12.9%
            # composed on OASIS-scale fields that never take it).
            # Routed through the config-owned routing overlay (env
            # still overrides) — VERDICT r4 #8.
            from pulpo_tpu import routing as _routing

            _routing.overlay({"PULPO_WARP_COARSE": "1"})
            loaders = create_data_loaders(1, segs=segs, lms=lms, mask=mask,
                                          ndims=ndims, path=path)
            self.loaders = list(loaders)
            self.loader_names = ["train", "val", "test"]
        elif task == "synthetic":
            from pulpo_tpu.data.loader import DataLoader
            from pulpo_tpu.data.synthetic import SyntheticDataset

            shape = self.model.cfg.input_size if self.model else (24, 28, 32)
            mk = lambda seed, n: DataLoader(
                SyntheticDataset(shape=shape, n=n, segs=segs, lms=lms, seed=seed),
                batch_size=1, shuffle=False, seed=seed)
            self.loaders = [mk(0, 4), mk(1, 2), mk(2, 2)]
            self.loader_names = ["train", "val", "test"]
        else:
            raise ValueError(f"Task {task} does not exist.")

        self.metric_names = ["RMSE", "JDetStd", "JDetLeq0"]
        if segs:
            self.metric_names += ["Dice"]
        if lms:
            self.metric_names += ["LM_MAE", "LM_Euclid"]
        self.num_datasets = len(self.loaders)
        self.num_metrics = len(self.metric_names)
        self.num_inputs = max(len(dl.dataset) for dl in self.loaders)

    def sample_data(self, loader_name: str, index: int = 0):
        """One batch from a named loader (evaluate.py:161-177)."""
        loader = self.loaders[self.loader_names.index(loader_name)]
        for i, batch in enumerate(loader):
            if i == index:
                batch["loader"] = loader_name
                return batch
        raise ValueError(f"Index {index} out of range for loader {loader_name}.")

    def _next_rng(self):
        self.rng, sub = jax.random.split(self.rng)
        return sub

    # ------------------------------------------------------------------
    # Artifact injection (robustness/UQ experiments)
    # ------------------------------------------------------------------

    def _artifact_box(self, spatial):
        """The reference's fixed ROI x=(100,130) y=(100,130) z=(120,150)
        (evaluate.py:1188, 1255, 1333, 1421, 1500). For volumes too small
        to contain it we fall back to a fractional box (0.45..0.65 per
        axis) so the experiments run on any input size (DIVERGENCES.md)."""
        fixed = [(100, 130), (100, 130), (120, 150)][: len(spatial)]
        if all(hi <= s for (_, hi), s in zip(fixed, spatial)):
            return tuple(fixed)
        return tuple((int(s * 0.45), int(s * 0.65)) for s in spatial)

    def _inject_artifact(self, x, method: str):
        box = self._artifact_box(tuple(np.asarray(x).shape[1:-1]))
        return jnp.asarray(artifact_fn(np.asarray(x), method, *box))

    # ------------------------------------------------------------------
    # Prediction (evaluate.py:179-280 schema)
    # ------------------------------------------------------------------

    def predict(self, batch, num_samples=20, deterministic=False,
                keep_samples="auto"):
        """Returns (preds, all_preds) in the reference tuple schema:

        preds = [y_pred, df_pred, seg_pred, outputs, individual_dfs,
                 combined_dfs, final_dfs, warped_seg, prediction_name]
        all_preds = [] for N==1, else [output_std, individual_df_std,
                 final_df_std, all_outputs, all_individual_dfs,
                 all_combined_dfs, all_final_dfs, all_warped_seg]

        `keep_samples=True` (the reference's retention, evaluate.py:
        220-235) keeps all N per-sample outputs/dfs; False streams
        statistics only (all_preds[4..6] become None) — the memory-
        bounded mode for large N at full resolution. The default "auto"
        retains only when the buffers fit the HBM budget
        (uq.predict.decide_keep_samples), so the flagship full-res N=32
        eval cannot OOM by default.
        """
        model, variables = self.model, self.variables
        x, y = jnp.asarray(batch["x"]), jnp.asarray(batch["y"])
        if keep_samples == "auto" and num_samples > 1:
            from pulpo_tpu.uq.predict import decide_keep_samples

            dtype_bytes = 2 if model.dtype == jnp.bfloat16 else 4
            keep_samples = decide_keep_samples(
                model.cfg, num_samples, batch=x.shape[0],
                dtype_bytes=dtype_bytes)
        elif keep_samples == "auto":
            keep_samples = True
        seg_x = batch.get("seg_x")
        if deterministic and num_samples != 1:
            raise ValueError(
                "Deterministic predictions with more than 1 sample make no sense!")

        if num_samples == 1:
            if deterministic:
                outputs, individual_dfs = model.predict_deterministic(variables, x, y)
                name = "deterministic_prediction"
            else:
                outputs, individual_dfs = model.predict(
                    variables, x, y, 1, self._next_rng())
                name = "sample_prediction"
            combined_dfs, final_dfs = model.combine_dfs(individual_dfs)
            if self.segs and seg_x is not None:
                warped_seg = {
                    l: warp_image_auto(jnp.asarray(seg_x), final_dfs[l]) for l in final_dfs}
            else:
                warped_seg = {0: np.empty((0,), np.float32)}
            return (
                [outputs[0], final_dfs[0], warped_seg[0], outputs, individual_dfs,
                 combined_dfs, final_dfs, warped_seg, name],
                [],
            )

        name = f"avg_prediction_over_{num_samples}_samples"
        mask = jnp.asarray(batch["mask_x"]) if (self.mask and batch.get("mask_x") is not None) else None
        res = predict_with_uncertainty(
            model, variables, x, y, num_samples, self._next_rng(), mask=mask,
            keep_samples=keep_samples)
        combined_dfs, final_dfs = model.combine_dfs(res.avg_dfs)
        if self.segs and seg_x is not None:
            warped_seg = {l: warp_image_auto(jnp.asarray(seg_x), final_dfs[l]) for l in final_dfs}
        else:
            warped_seg = {0: np.empty((0,), np.float32)}
        preds = [res.mean_outputs[0], final_dfs[0], warped_seg[0], res.mean_outputs,
                 res.avg_dfs, combined_dfs, final_dfs, warped_seg, name]
        # all_* buffers are sample-first with B squeezed, matching the
        # reference's (N, ...) layout (evaluate.py:220-235)
        squeeze_b = lambda d: (
            None if d is None else {l: v[:, 0] for l, v in d.items()})
        if keep_samples:
            all_outputs = squeeze_b(res.sample_outputs)
            all_individual = squeeze_b(res.sample_individual_dfs)
            all_combined = squeeze_b(res.sample_combined_dfs)
            all_final = squeeze_b(res.sample_final_dfs)
            # per-sample warped segs: the reference only computes these
            # on the batched 2D path (evaluate.py:271); in 3D it returns
            # an empty dict for memory reasons (evaluate.py:209-211)
            if self.segs and seg_x is not None and x.ndim == 4:  # 2D
                seg_rep = jnp.repeat(jnp.asarray(seg_x), num_samples, axis=0)
                all_warped_seg = {
                    l: warp_image_auto(seg_rep, res.sample_final_dfs[l][:, 0])
                    for l in all_final}
            else:
                all_warped_seg = {0: np.empty((0,), np.float32)}
        else:
            # first-chunk-only sample outputs (figure sample grids)
            all_outputs = {l: jnp.swapaxes(v, 0, 1)[:, 0]
                           for l, v in res.outputs.items()}
            all_individual = all_combined = all_final = None
            all_warped_seg = {0: np.empty((0,), np.float32)}
        all_preds = [res.output_std, res.individual_df_std, res.final_df_std,
                     all_outputs, all_individual, all_combined, all_final,
                     all_warped_seg]
        return preds, all_preds

    # ------------------------------------------------------------------
    # Performance table (evaluate.py:1379-1498)
    # ------------------------------------------------------------------

    def performance(self, artifact: str = "", save: bool = True) -> pd.DataFrame:
        model, variables = self.model, self.variables
        K = self.latent_levels
        all_metrics = np.full(
            [self.num_metrics, K, self.num_datasets, self.num_inputs], np.nan)

        unit_w = {l: 1.0 for l in range(K)}
        unit_win = {l: 1 for l in range(K)}

        for k, loader in enumerate(self.loaders):
            for j, batch in enumerate(loader):
                x, y = jnp.asarray(batch["x"]), jnp.asarray(batch["y"])
                if artifact:
                    x = self._inject_artifact(x, artifact)
                outputs, individual_dfs = model.predict_deterministic(variables, x, y)
                _, final_dfs = model.combine_dfs(individual_dfs)

                seg_x, seg_y = batch.get("seg_x"), batch.get("seg_y")
                has_segs = seg_x is not None
                if has_segs:
                    pred_segs = {
                        l: warp_image_auto(jnp.asarray(seg_x), final_dfs[l]) for l in final_dfs}

                num_pixels = {
                    l: float(np.prod(outputs[l].shape[1:-1])) for l in range(K)}
                col = 0
                # RMSE: unit-weight hierarchical MSE / voxels, sqrt
                _, level_mse = L.hierarchical_reconstruction_loss(
                    outputs, y, unit_w, ("mse",), unit_win)
                for l in range(K):
                    all_metrics[col, l, k, j] = float(
                        jnp.sqrt(level_mse[l] / num_pixels[l]))
                col += 1
                # JDetStd over final dfs
                _, level_jdet = L.hierarchical_regularization(
                    final_dfs, unit_w, regularizer="jdet", lamb=1.0)
                for l in range(K):
                    all_metrics[col, l, k, j] = float(level_jdet[l])
                col += 1
                # JDetLeq0 %
                for l in range(K):
                    jd = L.jacobian_det(final_dfs[l])
                    all_metrics[col, l, k, j] = M.jdet_leq0_percent(np.asarray(jd))
                col += 1
                if "Dice" in self.metric_names:
                    if has_segs:
                        _, level_dice = L.hierarchical_reconstruction_loss(
                            outputs, y, unit_w, ("dice",), unit_win,
                            dice_factor=1.0, y_hat_seg=pred_segs,
                            seg_y=jnp.asarray(seg_y))
                        for l in range(K):
                            all_metrics[col, l, k, j] = 1.0 - float(
                                level_dice[l] / num_pixels[l])
                    col += 1
                if "LM_MAE" in self.metric_names:
                    lm_x, lm_y = batch.get("lm_x"), batch.get("lm_y")
                    if lm_x is not None and lm_y is not None and lm_x.size and lm_y.size:
                        warped = warp_landmarks(jnp.asarray(lm_x), final_dfs[0])
                        all_metrics[col, 0, k, j] = M.lm_mae(np.asarray(warped), lm_y)
                        all_metrics[col + 1, 0, k, j] = M.lm_euclid(
                            np.asarray(warped), lm_y)
                    col += 2

        # reference parity: exact-zero entries are scrubbed to NaN before
        # the mean (evaluate.py uses 0 as its "empty slot" sentinel, so
        # e.g. a 0% JDetLeq0 column reads NaN in its tables)
        all_metrics[all_metrics == 0] = np.nan
        mean_metrics = np.nanmean(all_metrics, axis=-1)
        data = np.concatenate(mean_metrics.T, axis=1)
        sets = np.repeat(self.loader_names, self.num_metrics)
        mets = np.tile(self.metric_names, self.num_datasets)
        mux = pd.MultiIndex.from_arrays((sets, mets))
        df = pd.DataFrame(data, columns=mux, index=range(K)).round(3)
        if save:
            make_tables(df, self.output_dir / "loss",
                        name="loss_table_deterministic" + artifact)
        return df

    # ------------------------------------------------------------------
    # Uncertainty table (evaluate.py:1500-1576)
    # ------------------------------------------------------------------

    def uncertainty(self, num_samples: int, artifact: str = "",
                    save: bool = True) -> pd.DataFrame:
        if num_samples < 2:
            raise ValueError("N has to be at least 2")
        model, variables = self.model, self.variables
        metric_names = ["Var", "NCC"]
        if self.lms:
            metric_names += ["LM_VAR", "LM_NCC"]
        all_metrics = np.full(
            [len(metric_names), self.num_datasets, self.num_inputs], np.nan)

        for k, loader in enumerate(self.loaders):
            for j, batch in enumerate(loader):
                x, y = jnp.asarray(batch["x"]), jnp.asarray(batch["y"])
                if artifact:
                    x = self._inject_artifact(x, artifact)
                lm_x, lm_y = batch.get("lm_x"), batch.get("lm_y")
                has_lms = (self.lms and lm_x is not None and lm_x.size
                           and lm_y is not None and lm_y.size)
                # lm threads through the UQ program so the per-sample
                # landmark warps use the SAME posterior draws as the
                # Var/NCC maps (the reference couples them via
                # all_final_dfs, evaluate.py:1547-1556). Pad the count
                # to a fixed bucket: per-subject n_lm variation would
                # otherwise retrace (and on the relay recompile for ~1h)
                # the whole UQ program per distinct count.
                if has_lms:
                    n_lm = int(np.asarray(lm_x).shape[1])
                    lm_in = _pad_landmarks(jnp.asarray(lm_x))
                else:
                    lm_in = None
                res = predict_with_uncertainty(
                    model, variables, x, y, num_samples, self._next_rng(),
                    lm=lm_in)
                moved_std = np.asarray(res.output_std[0][0])  # (*sp,)
                mse = np.asarray(res.output_mse[0][0])  # streamed over N
                var = moved_std**2
                all_metrics[0, k, j] = var.mean()
                all_metrics[1, k, j] = M.global_ncc(var, mse)

                if has_lms:
                    lm_hat = np.asarray(
                        warp_landmarks(jnp.asarray(lm_x), res.final_dfs[0]))
                    # drop the padded rows host-side
                    warped_lms = np.asarray(res.sample_landmarks[:, 0, :n_lm])
                    all_metrics[2, k, j] = M.lms_var(warped_lms).mean()
                    all_metrics[3, k, j] = M.lms_corr(
                        lm_hat[0], warped_lms, np.asarray(lm_y)[0])

        # reference parity: exact-zero entries are scrubbed to NaN before
        # the mean (evaluate.py uses 0 as its "empty slot" sentinel, so
        # e.g. a 0% JDetLeq0 column reads NaN in its tables)
        all_metrics[all_metrics == 0] = np.nan
        mean_metrics = np.nanmean(all_metrics, axis=-1)
        data = np.concatenate(mean_metrics.T)[None, :]
        sets = np.repeat(self.loader_names, len(metric_names))
        mets = np.tile(metric_names, self.num_datasets)
        mux = pd.MultiIndex.from_arrays((sets, mets))
        df = pd.DataFrame(data, columns=mux)
        if save:
            make_tables(df, self.output_dir / "uncertainty",
                        name="loss_table" + artifact)
        return df

    # ------------------------------------------------------------------
    # Affine (identity) baseline (evaluate.py:1146-1221)
    # ------------------------------------------------------------------

    def performance_affine(self, artifact: str = "",
                           save: bool = True) -> pd.DataFrame:
        """No-op registration baseline: prediction == moving image
        (the datasets are affinely pre-aligned). evaluate.py:1146-1221
        incl. the artifact hook at :1187-1188."""
        all_metrics = np.full(
            [self.num_metrics, self.num_datasets, self.num_inputs], np.nan)
        for k, loader in enumerate(self.loaders):
            for j, batch in enumerate(loader):
                x, y = np.asarray(batch["x"]), np.asarray(batch["y"])
                if artifact:
                    x = np.asarray(self._inject_artifact(x, artifact))
                all_metrics[0, k, j] = M.rmse(x, y)
                seg_x, seg_y = batch.get("seg_x"), batch.get("seg_y")
                if "Dice" in self.metric_names and seg_x is not None:
                    all_metrics[self.metric_names.index("Dice"), k, j] = M.dsc(
                        seg_x, seg_y)
                lm_x, lm_y = batch.get("lm_x"), batch.get("lm_y")
                if "LM_MAE" in self.metric_names and lm_x is not None and lm_x.size:
                    all_metrics[self.metric_names.index("LM_MAE"), k, j] = M.lm_mae(
                        lm_x, lm_y)
                    all_metrics[self.metric_names.index("LM_Euclid"), k, j] = (
                        M.lm_euclid(lm_x, lm_y))
        # reference parity: exact-zero entries are scrubbed to NaN before
        # the mean (evaluate.py uses 0 as its "empty slot" sentinel, so
        # e.g. a 0% JDetLeq0 column reads NaN in its tables)
        all_metrics[all_metrics == 0] = np.nan
        mean_metrics = np.nanmean(all_metrics, axis=-1)
        data = mean_metrics.T
        sets = np.repeat(self.loader_names, self.num_metrics)
        mets = np.tile(self.metric_names, self.num_datasets)
        df = pd.DataFrame(
            data.reshape(1, -1),
            columns=pd.MultiIndex.from_arrays((sets, mets)))
        if save:
            make_tables(df, self.output_dir / "loss",
                        name="loss_table_affine" + artifact)
        return df

    # ------------------------------------------------------------------
    # Full pipeline (evaluate.py:1579-1719)
    # ------------------------------------------------------------------

    def run_one_model(self, run_dir=None, segs=False, lms=False, mask=False,
                      N=10, task="oasis", data_path=None, visualize=True):
        if run_dir is not None:
            self.load_model(run_dir)
        ndims = self.model.cfg.ndims
        self.load_data(task=task, segs=segs, lms=lms, mask=mask, ndims=ndims,
                       path=data_path)
        for sub in ("jdet", "loss", "uncertainty", "vis"):
            (self.output_dir / sub).mkdir(parents=True, exist_ok=True)

        if visualize:
            from pulpo_tpu.eval.visualize import visualize_prediction

            for k, lname in enumerate(self.loader_names):
                batch = self.sample_data(loader_name=lname)
                for pname, (ns, det) in {
                    "deterministic": (1, True),
                    "sample": (1, False),
                    f"avg_{N}": (N, False),
                }.items():
                    preds, all_preds = self.predict(batch, num_samples=ns,
                                                    deterministic=det)
                    visualize_prediction(
                        batch, preds, all_preds, latent_levels=self.latent_levels,
                        title=f"All visualizations on {lname} set with {pname} prediction",
                        save_path=self.output_dir / "vis" / f"allvis{lname}_{pname}.png",
                    )
                    table_jdet(
                        {l: np.asarray(v) for l, v in preds[6].items()},
                        {l: np.asarray(v) for l, v in preds[4].items()},
                        output_dir=self.output_dir / "jdet",
                        name=f"{lname}_{pname}", save=True, fontsize=10)

        perf = self.performance()
        unc = self.uncertainty(num_samples=N) if N > 1 else None
        return perf, unc

    # ------------------------------------------------------------------
    # DIF-VoxelMorph baseline (evaluate.py:113-118, 282-309, 1224-1377)
    # ------------------------------------------------------------------

    def load_vxm(self, variables, input_size, output_dir="evaluation_vxm"):
        """Attach a native DIF-VM baseline (pulpo_tpu.models.voxelmorph)."""
        from pulpo_tpu.models.voxelmorph import VxmModel

        self.vxm = VxmModel(input_size)
        self.vxm_variables = variables
        self.output_dir = pathlib.Path(output_dir)
        self.output_dir.mkdir(parents=True, exist_ok=True)
        return self.vxm

    def performance_vxm(self, num_samples: int = 1, artifact: str = "",
                        save: bool = True) -> pd.DataFrame:
        """Deterministic (or N-sample-mean) metrics for the baseline:
        RMSE / JDetStd / JDetLeq0 (+ LM metrics) at full res
        (evaluate.py:1224-1304 incl. the artifact hook at :1254-1255)."""
        names = ["RMSE", "JDetStd", "JDetLeq0"] + (
            ["LM_MAE", "LM_Euclid"] if self.lms else [])
        all_metrics = np.full([len(names), self.num_datasets, self.num_inputs], np.nan)
        for k, loader in enumerate(self.loaders):
            for j, batch in enumerate(loader):
                x, y = jnp.asarray(batch["x"]), jnp.asarray(batch["y"])
                if artifact:
                    x = self._inject_artifact(x, artifact)
                if num_samples == 1:
                    moved, df, _ = self.vxm.apply(
                        self.vxm_variables, x, y, deterministic=True)
                else:
                    moved, df, *_ = self.vxm.predict(
                        self.vxm_variables, x, y, num_samples, self._next_rng())
                all_metrics[0, k, j] = M.rmse(np.asarray(moved), np.asarray(y))
                all_metrics[1, k, j] = float(L.jdet_std(df, lamb=1.0))
                all_metrics[2, k, j] = M.jdet_leq0_percent(
                    np.asarray(L.jacobian_det(df)))
                lm_x, lm_y = batch.get("lm_x"), batch.get("lm_y")
                if self.lms and lm_x is not None and lm_x.size and lm_y is not None and lm_y.size:
                    warped = warp_landmarks(jnp.asarray(lm_x), df)
                    all_metrics[3, k, j] = M.lm_mae(np.asarray(warped), lm_y)
                    all_metrics[4, k, j] = M.lm_euclid(np.asarray(warped), lm_y)
        all_metrics[all_metrics == 0] = np.nan  # reference zero-scrub
        mean = np.nanmean(all_metrics, axis=-1)
        sets = np.repeat(self.loader_names, len(names))
        mets = np.tile(names, self.num_datasets)
        df = pd.DataFrame(mean.T.reshape(1, -1),
                          columns=pd.MultiIndex.from_arrays((sets, mets))).round(3)
        if save:
            make_tables(df, self.output_dir / "loss",
                        name="loss_table_vxm" + artifact)
        return df

    def uncertainty_vxm(self, num_samples: int, artifact: str = "",
                        save: bool = True) -> pd.DataFrame:
        """Var + NCC(var, mse) calibration (+ LM_VAR/LM_NCC) for the
        baseline (evaluate.py:1300-1377 incl. the artifact hook at
        :1332-1333 and the landmark metrics at :1347-1354)."""
        if num_samples < 2:
            raise ValueError("N has to be at least 2")
        names = ["Var", "NCC"] + (["LM_VAR", "LM_NCC"] if self.lms else [])
        all_metrics = np.full([len(names), self.num_datasets, self.num_inputs], np.nan)
        for k, loader in enumerate(self.loaders):
            for j, batch in enumerate(loader):
                x, y = jnp.asarray(batch["x"]), jnp.asarray(batch["y"])
                if artifact:
                    x = self._inject_artifact(x, artifact)
                _avg, avg_df, moved_std, _dstd, all_moved, all_dfs = self.vxm.predict(
                    self.vxm_variables, x, y, num_samples, self._next_rng())
                mse = np.mean((np.asarray(all_moved) - np.asarray(y)) ** 2, axis=0)[0, ..., 0]
                var = np.asarray(moved_std)[0] ** 2
                all_metrics[0, k, j] = var.mean()
                all_metrics[1, k, j] = M.global_ncc(var, mse)
                lm_x, lm_y = batch.get("lm_x"), batch.get("lm_y")
                if (self.lms and lm_x is not None and lm_x.size
                        and lm_y is not None and lm_y.size):
                    lm_hat = np.asarray(
                        warp_landmarks(jnp.asarray(lm_x), avg_df))
                    lm_rep = jnp.repeat(jnp.asarray(lm_x), num_samples, axis=0)
                    warped_lms = np.asarray(
                        warp_landmarks(lm_rep, all_dfs[:, 0]))
                    all_metrics[2, k, j] = M.lms_var(warped_lms).mean()
                    all_metrics[3, k, j] = M.lms_corr(
                        lm_hat[0], warped_lms, np.asarray(lm_y)[0])
        all_metrics[all_metrics == 0] = np.nan  # reference zero-scrub
        mean = np.nanmean(all_metrics, axis=-1)
        sets = np.repeat(self.loader_names, len(names))
        mets = np.tile(names, self.num_datasets)
        df = pd.DataFrame(mean.T.reshape(1, -1),
                          columns=pd.MultiIndex.from_arrays((sets, mets)))
        if save:
            make_tables(df, self.output_dir / "uncertainty",
                        name="loss_table_vxm" + artifact)
        return df

    # ------------------------------------------------------------------
    # Multi-model leaderboard (evaluate.py:1721-1801)
    # ------------------------------------------------------------------

    def compare_models(self, run_dirs, model_names=None, task="oasis", segs=False,
                       lms=False, N=10, data_path=None,
                       output_dir="experiments/compare") -> pd.DataFrame:
        model_names = model_names or [str(r) for r in run_dirs]
        first = True
        rows = []
        for rd in run_dirs:
            self.load_model(rd)
            if first:
                self.load_data(task=task, segs=segs, lms=lms, mask=False,
                               ndims=self.model.cfg.ndims, path=data_path)
                first = False
            all_metrics = np.full(
                [self.num_metrics, self.num_datasets, self.num_inputs], np.nan)
            for k, loader in enumerate(self.loaders):
                for j, batch in enumerate(loader):
                    x, y = jnp.asarray(batch["x"]), jnp.asarray(batch["y"])
                    outputs, dfs = self.model.predict(
                        self.variables, x, y, N, self._next_rng())
                    _, final_dfs = self.model.combine_dfs(dfs)
                    y_pred, df_pred = outputs[0], final_dfs[0]
                    num_pixels = float(np.prod(y_pred.shape[1:-1]))
                    all_metrics[0, k, j] = float(
                        jnp.sqrt(L.l2_loss(y_pred, y) / num_pixels))
                    all_metrics[1, k, j] = float(L.jdet_std(df_pred, lamb=1.0))
                    all_metrics[2, k, j] = M.jdet_leq0_percent(
                        np.asarray(L.jacobian_det(df_pred)))
                    seg_x, seg_y = batch.get("seg_x"), batch.get("seg_y")
                    if "Dice" in self.metric_names and seg_x is not None:
                        pred_seg = warp_image_auto(jnp.asarray(seg_x), final_dfs[0])
                        all_metrics[self.metric_names.index("Dice"), k, j] = 1 - float(
                            L.soft_dice_loss(pred_seg, jnp.asarray(seg_y)) / num_pixels)
            # one row per model (all loaders aggregated), matching the
            # index=model_names frame below (evaluate.py:1794-1799)
            rows.append(np.concatenate(np.nanmean(all_metrics, axis=-1).T))
        sets = np.repeat(self.loader_names, self.num_metrics)
        mets = np.tile(self.metric_names, self.num_datasets)
        df = pd.DataFrame(np.stack(rows), index=model_names,
                          columns=pd.MultiIndex.from_arrays((sets, mets))).round(3)
        make_tables(df, output_dir, name="loss_table")
        return df
