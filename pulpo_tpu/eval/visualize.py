"""Evaluation figures: the configurable multi-row visualization driver.

Mirrors the reference's `Evaluate.visualize` (evaluate.py:681-832) and
its full row menu (evaluate.py:833-1138): callers pass a list of row
names (or row callables) plus optional per-row parameter overrides
(`rowparams`), and each row renders into a fixed 4-column figure row.

Row menu (reference method of the same name):

  x_pred_y                 :833   segx_segpred_segy        :856
  pred_per_level           :883   segpred_per_level        :897
  diff_input_pred          :914   diff_target_pred         :929
  jdet                     :944   final_df_per_level       :967
  combined_df_per_level    :991   individual_df_per_level  :1016
  output_var_per_level     :1041  individual_df_var_per_level :1057
  final_df_var_per_level   :1080  sample_preds             :1098
  sample_segpreds          :1109  sample_dfs               :1120

Data layout: channels-last; 3D volumes are sliced to the middle of
spatial axis -2 (the reference's `[..., idx, :]` on NC(D)HW tensors,
evaluate.py:697-776) and 3-channel DFs keep channels (0, 2). Images are
np.rot90'ed for display exactly like the reference.
"""

from __future__ import annotations

import numpy as np

from pulpo_tpu.eval.flow_viz import flow_to_image
from pulpo_tpu.ops.losses import jacobian_det


# ---------------------------------------------------------------------------
# 2D slicing (evaluate.py:693-780)
# ---------------------------------------------------------------------------


def _slice2d(a, is_df=False):
    """(B, *spatial, C) -> (B, H, W, C') middle slice of axis -2 (3D)."""
    a = np.asarray(a)
    if a.ndim == 5:  # (B, D, H, W, C)
        a = a[:, :, a.shape[2] // 2, :, :]
        if is_df and a.shape[-1] == 3:
            a = np.stack([a[..., 0], a[..., 2]], axis=-1)
    return a


def _slice_map(a):
    """(B, *spatial) std/variance map -> (B, H, W)."""
    a = np.asarray(a)
    if a.ndim == 4:
        a = a[:, :, a.shape[2] // 2, :]
    return a


def _slice_samples(a, is_df=False):
    """(N, *spatial, C) per-sample buffers -> (N, H, W, C')."""
    a = np.asarray(a)
    if a.ndim == 5:
        a = a[:, :, a.shape[2] // 2, :, :]
        if is_df and a.shape[-1] == 3:
            a = np.stack([a[..., 0], a[..., 2]], axis=-1)
    return a


def _seg_label(seg2d):
    """One-hot (H, W, C) -> label map."""
    return np.argmax(np.asarray(seg2d), axis=-1)


def _has(x) -> bool:
    return x is not None and np.asarray(x).size > 0


def _img(ax, a, cmap="gray", vmin=None, vmax=None, label=None):
    ax.imshow(np.rot90(np.asarray(a)), cmap=cmap, vmin=vmin, vmax=vmax)
    if label:
        ax.set_xlabel(label)


def _resize2d(a, shape):
    """Nearest-neighbor resize of a 2D map (mask alignment only)."""
    a = np.asarray(a)
    iy = np.clip((np.arange(shape[0]) * a.shape[0] / shape[0]).astype(int),
                 0, a.shape[0] - 1)
    ix = np.clip((np.arange(shape[1]) * a.shape[1] / shape[1]).astype(int),
                 0, a.shape[1] - 1)
    return a[np.ix_(iy, ix)]


# ---------------------------------------------------------------------------
# Warped grid (evaluate.py:430-526)
# ---------------------------------------------------------------------------


def create_warped_grid(df2d: np.ndarray, grid_size: int = 20):
    """Sparse control grid displaced by -df at the grid points,
    b-spline smoothed via scipy when available.
    df2d: (H, W, 2) with channels (row-disp, col-disp)."""
    h, w, _ = df2d.shape
    ys = np.linspace(0, h - 1, grid_size)
    xs = np.linspace(0, w - 1, grid_size)
    lines = []

    def smooth(points):
        try:
            from scipy.interpolate import splev, splprep

            if len(points) > 3:
                tck, _ = splprep(points.T, s=0, k=3)
                u = np.linspace(0, 1, len(points) * 4)
                return np.stack(splev(u, tck), axis=1)
        except Exception:
            pass
        return points

    def warped_point(yv, xv):
        iy, ix = int(round(yv)), int(round(xv))
        d = df2d[iy, ix]
        return [xv - d[1], yv - d[0]]

    for yv in ys:
        lines.append(smooth(np.asarray([warped_point(yv, xv) for xv in xs])))
    for xv in xs:
        lines.append(smooth(np.asarray([warped_point(yv, xv) for yv in ys])))
    return lines


def _plot_grid(ax, df2d, grid_size=20, color="black", lw=0.5, scatter=False):
    from matplotlib.collections import LineCollection

    # the reference rotates the field spatially before gridding
    # (np.rot90(df, axes=(-2,-1)), evaluate.py:977) without remapping
    # the displacement channels — replicated for visual parity
    rot = np.rot90(np.asarray(df2d), axes=(0, 1))
    lines = create_warped_grid(rot, grid_size)
    ax.add_collection(LineCollection(lines, colors=color, linewidths=lw))
    if scatter:
        pts = np.concatenate(lines, axis=0)
        ax.scatter(pts[:, 0], pts[:, 1], s=0.3, c=color)
    h, w = rot.shape[:2]
    ax.set_xlim(-1, w)
    ax.set_ylim(h, -1)


def _flow_img(df2d):
    """(H, W, 2) -> RGB flow colorization, display-rotated."""
    return np.rot90(flow_to_image(np.asarray(df2d)[None])[0])


def _hsv_colorbar(ax):
    import matplotlib.pyplot as plt
    from matplotlib import cm
    from matplotlib.pyplot import get_cmap

    cbar = plt.colorbar(cm.ScalarMappable(cmap=get_cmap("hsv")), ax=ax)
    cbar.set_ticks([0.18, 0.51, 0.7, 1.0])
    cbar.set_ticklabels(["←", "↓", "→", "↑"])


def _off_extra(ax_row, latent_levels):
    for c in range(latent_levels, len(ax_row)):
        ax_row[c].axis("off")


# ---------------------------------------------------------------------------
# Row renderers. Signature: (ctx, ax_row, **rowparams); `ctx` carries the
# 2D-sliced inputs/preds/all_preds and figure-level settings.
# ---------------------------------------------------------------------------


class _Ctx:
    def __init__(self, batch, preds, all_preds, latent_levels, grid_size, fig):
        self.batch = batch
        self.preds = preds
        self.all_preds = all_preds
        self.latent_levels = latent_levels
        self.grid_size = grid_size
        self.fig = fig


def vis_x_pred_y(ctx, ax, vmin=0, vmax=1):
    """Moving | prediction | fixed | flow (evaluate.py:833-854)."""
    _img(ax[0], ctx.batch["x"][0, ..., 0], vmin=vmin, vmax=vmax, label="Input")
    _img(ax[1], ctx.preds[0][0, ..., 0], vmin=vmin, vmax=vmax, label="Prediction")
    _img(ax[2], ctx.batch["y"][0, ..., 0], vmin=vmin, vmax=vmax, label="Target")
    ax[3].imshow(_flow_img(ctx.preds[6][0][0]))
    ax[3].set_xlabel("DF")
    ax[0].set_ylabel("input vs prediction")
    _hsv_colorbar(ax[3])


def vis_segx_segpred_segy(ctx, ax):
    """Seg triplet + flow (evaluate.py:856-881)."""
    _img(ax[0], _seg_label(ctx.batch["seg_x"][0]), cmap="tab20", label="Input")
    _img(ax[1], _seg_label(ctx.preds[2][0]), cmap="tab20", label="Prediction")
    _img(ax[2], _seg_label(ctx.batch["seg_y"][0]), cmap="tab20", label="Target")
    ax[3].imshow(_flow_img(ctx.preds[1][0]))
    ax[3].set_xlabel("DF")
    ax[0].set_ylabel("segmentation input vs prediction")
    _hsv_colorbar(ax[3])


def vis_pred_per_level(ctx, ax, vmin=0, vmax=1):
    """Per-level predictions, coarse->fine left->right (evaluate.py:883)."""
    K = ctx.latent_levels
    for l in reversed(range(K)):
        _img(ax[K - l - 1], ctx.preds[3][l][0, ..., 0], vmin=vmin, vmax=vmax,
             label=f"Level {l}")
    ax[0].set_ylabel("Predictions per level")
    _off_extra(ax, K)


def vis_segpred_per_level(ctx, ax):
    """Per-level predicted segmentations (evaluate.py:897-909)."""
    K = ctx.latent_levels
    for l in reversed(range(K)):
        _img(ax[K - l - 1], _seg_label(ctx.preds[7][l][0]), cmap="tab20",
             label=f"Level {l}")
    ax[0].set_ylabel("Predicted segmentation per level")
    _off_extra(ax, K)


def _diff_rows(ctx, ax, target_key, name, vmin, vmax):
    K = ctx.latent_levels
    tgt_full = ctx.batch[target_key][0, ..., 0]
    for l in reversed(range(K)):
        pred = ctx.preds[3][l][0, ..., 0]
        tgt = _resize2d(tgt_full, pred.shape)
        _img(ax[K - l - 1], pred - tgt, vmin=vmin, vmax=vmax,
             label=f"Level {l}")
    ax[0].set_ylabel(name)
    _off_extra(ax, K)


def vis_diff_input_pred(ctx, ax, vmin=-1, vmax=1):
    """outputs[l] - resize(x) per level (evaluate.py:914-927)."""
    _diff_rows(ctx, ax, "x", "Difference Input / Predictions per level",
               vmin, vmax)


def vis_diff_target_pred(ctx, ax, vmin=-1, vmax=1):
    """outputs[l] - resize(y) per level (evaluate.py:929-942)."""
    _diff_rows(ctx, ax, "y", "Difference Target / Predictions per level",
               vmin, vmax)


def vis_jdet(ctx, ax):
    """Jacobian-determinant heatmaps of the final dfs (evaluate.py:944)."""
    K = ctx.latent_levels
    for l in reversed(range(K)):
        jd = ctx._jdet[l]  # from the unsliced 3D dfs, then sliced
        im = ax[K - l - 1].imshow(np.rot90(jd), cmap="coolwarm",
                                  vmin=-2, vmax=4)
        ax[K - l - 1].set_xlabel(f"Level {l}")
        if l == 0:
            ctx.fig.colorbar(im, ax=ax[K - l - 1], fraction=0.04)
    ax[0].set_ylabel("heatmap of JDet std")
    _off_extra(ax, K)


def _df_row(ctx, ax, dfs, name, flow=True, grid=True, scatter=False):
    K = ctx.latent_levels
    for l in reversed(range(K)):
        a = ax[K - l - 1]
        if flow:
            a.imshow(_flow_img(dfs[l][0]))
        if grid:
            _plot_grid(a, dfs[l][0], ctx.grid_size, scatter=scatter)
        a.set_xlabel(f"Level {l}")
    ax[0].set_ylabel(name)
    _off_extra(ax, K)


def vis_final_df_per_level(ctx, ax, flow=True, grid=True):
    """Final DF per level, flow + warped grid (evaluate.py:967-989)."""
    _df_row(ctx, ax, ctx.preds[6], "Final DF per level.", flow, grid)


def vis_combined_df_per_level(ctx, ax, flow=True, grid=True):
    """Combined DF per level (evaluate.py:991-1014)."""
    _df_row(ctx, ax, ctx.preds[5], "Combined DF per level.", flow, grid)


def vis_individual_df_per_level(ctx, ax, flow=True, grid=True):
    """Individual DF per level (evaluate.py:1016-1039)."""
    _df_row(ctx, ax, ctx.preds[4], "Individual DF per level.", flow, grid)


def _var_row(ctx, ax, std_map, name, mask_from_outputs=False):
    K = ctx.latent_levels
    for l in reversed(range(K)):
        var = np.asarray(std_map[l][0]) ** 2
        if mask_from_outputs:
            out = ctx.preds[3][l][0, ..., 0]
            mask = _resize2d(out, var.shape)
            var = np.where(mask == 0, 0.0, var)
        im = ax[K - l - 1].imshow(np.rot90(var), cmap="viridis")
        ctx.fig.colorbar(im, ax=ax[K - l - 1], fraction=0.04)
        ax[K - l - 1].set_xlabel(f"Level {l}")
    ax[0].set_ylabel(name)
    _off_extra(ax, K)


def vis_output_var_per_level(ctx, ax):
    """Prediction variance heatmaps (evaluate.py:1041-1055)."""
    _var_row(ctx, ax, ctx.all_preds[0], "heatmap of prediction variance")


def vis_individual_df_var_per_level(ctx, ax):
    """Individual-DF variance, masked where the prediction is 0
    (evaluate.py:1057-1078)."""
    _var_row(ctx, ax, ctx.all_preds[1], "heatmap of individual DF var",
             mask_from_outputs=True)


def vis_final_df_var_per_level(ctx, ax):
    """Final-DF variance, masked where the prediction is 0
    (evaluate.py:1080-1096)."""
    _var_row(ctx, ax, ctx.all_preds[2], "heatmap of final DF var",
             mask_from_outputs=True)


def vis_sample_preds(ctx, ax, level=0, vmin=0, vmax=1):
    """Per-sample predictions at one level (evaluate.py:1098-1107)."""
    samples = ctx.all_preds[3][level]
    n = min(samples.shape[0], ctx.latent_levels)
    for s in range(n):
        _img(ax[s], samples[s, ..., 0], vmin=vmin, vmax=vmax)
    ax[0].set_ylabel(f"Sample predictions on level {level}")
    _off_extra(ax, n)


def vis_sample_segpreds(ctx, ax, level=0):
    """Per-sample predicted segmentations (evaluate.py:1109-1118)."""
    samples = ctx.all_preds[7][level]
    n = min(samples.shape[0], ctx.latent_levels)
    for s in range(n):
        _img(ax[s], _seg_label(samples[s]), cmap="tab20")
    ax[0].set_ylabel(f"Sample predicted segmentations on level {level}")
    _off_extra(ax, n)


def vis_sample_dfs(ctx, ax, level=0, flow=True, grid=True):
    """Per-sample final DFs as warped grids (evaluate.py:1120-1138)."""
    samples = ctx.all_preds[6][level]
    n = min(samples.shape[0], ctx.latent_levels)
    for s in range(n):
        if grid:
            _plot_grid(ax[s], samples[s], ctx.grid_size, scatter=True)
    ax[0].set_ylabel(f"Sample predicted DFs on level {level}")
    _hsv_colorbar(ax[3])
    _off_extra(ax, n)


ROW_MENU = {
    "x_pred_y": vis_x_pred_y,
    "segx_segpred_segy": vis_segx_segpred_segy,
    "pred_per_level": vis_pred_per_level,
    "segpred_per_level": vis_segpred_per_level,
    "diff_input_pred": vis_diff_input_pred,
    "diff_target_pred": vis_diff_target_pred,
    "jdet": vis_jdet,
    "final_df_per_level": vis_final_df_per_level,
    "combined_df_per_level": vis_combined_df_per_level,
    "individual_df_per_level": vis_individual_df_per_level,
    "output_var_per_level": vis_output_var_per_level,
    "individual_df_var_per_level": vis_individual_df_var_per_level,
    "final_df_var_per_level": vis_final_df_var_per_level,
    "sample_preds": vis_sample_preds,
    "sample_segpreds": vis_sample_segpreds,
    "sample_dfs": vis_sample_dfs,
}


def default_visualizations(segs: bool, has_uq: bool, has_sample_segs: bool = False):
    """The reference's standard menus (evaluate.py:1613-1697)."""
    rows = ["x_pred_y"]
    if segs:
        rows += ["segx_segpred_segy"]
    rows += ["pred_per_level"]
    if segs:
        rows += ["segpred_per_level"]
    rows += ["diff_input_pred", "diff_target_pred", "final_df_per_level",
             "combined_df_per_level", "individual_df_per_level", "jdet"]
    rowparams = {}
    if has_uq:
        rows += ["output_var_per_level", "individual_df_var_per_level",
                 "final_df_var_per_level", "sample_preds"]
        if segs and has_sample_segs:
            rows += ["sample_segpreds"]
        rows += ["sample_dfs"]
        # the reference disables the grid overlay on the (large) final /
        # combined df rows in UQ figures (rowparams at evaluate.py:1678)
        rowparams[rows.index("final_df_per_level")] = {
            "flow": True, "grid": False}
        rowparams[rows.index("combined_df_per_level")] = {
            "flow": True, "grid": False}
    return rows, rowparams


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------


def _slice_level_dict(d, is_df=False, per_sample=False):
    if d is None:
        return None
    out = {}
    for l, v in d.items():
        v = np.asarray(v)
        if v.size == 0:
            out[l] = v
        elif per_sample:
            out[l] = _slice_samples(v, is_df=is_df)
        else:
            out[l] = _slice2d(v, is_df=is_df)
    return out


def visualize(batch, preds, visualizations, all_preds=None, rowparams=None,
              latent_levels: int = 4, grid_size: int = 20, title: str = "",
              save_path=None, show: bool = False):
    """Render the selected rows into one 4-column figure
    (evaluate.py:681-832).

    `visualizations`: list of row names (see ROW_MENU) or callables.
    `rowparams`: {row_index: kwargs} overrides, like the reference's.
    `preds`/`all_preds`: the tuples produced by Evaluate.predict.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rowparams = rowparams or {}
    rows = len(visualizations)
    # the reference hardcodes 4 columns (evaluate.py:705); widen for
    # configs with more latent levels so per-level rows don't overflow
    ncols = max(4, latent_levels)
    fig, ax = plt.subplots(rows, ncols)
    fig.set_figwidth(30)
    fig.set_figheight(30 * rows / max(latent_levels, 1))
    if title:
        fig.suptitle(f"{title}. {preds[-1]} on the {batch.get('loader', '?')} set.",
                     fontsize=16)

    # ---- slice everything to 2D once (evaluate.py:693-780) ----
    b2 = {k: (_slice2d(v) if _has(v) and not np.isscalar(v)
              and not isinstance(v, str) and np.asarray(v).ndim >= 4 else v)
          for k, v in batch.items()}
    p2 = [
        _slice2d(preds[0]),                        # y_pred
        None,                                      # df_pred (set below)
        _slice2d(preds[2]) if _has(preds[2]) else np.empty(0),  # seg_pred
        _slice_level_dict(preds[3]),               # outputs
        _slice_level_dict(preds[4], is_df=True),   # individual dfs
        _slice_level_dict(preds[5], is_df=True),   # combined dfs
        _slice_level_dict(preds[6], is_df=True),   # final dfs
        _slice_level_dict(preds[7]),               # warped seg
        preds[8],
    ]
    # df_pred keeps its batch axis for _flow_img symmetry
    p2[1] = _slice2d(preds[1], is_df=True) if _has(preds[1]) else np.empty(0)

    a2 = None
    if all_preds:
        a2 = [
            {l: _slice_map(v) for l, v in all_preds[0].items()},  # output_std
            {l: _slice_map(v) for l, v in all_preds[1].items()},
            {l: _slice_map(v) for l, v in all_preds[2].items()},
            _slice_level_dict(all_preds[3], per_sample=True),
            _slice_level_dict(all_preds[4], is_df=True, per_sample=True),
            _slice_level_dict(all_preds[5], is_df=True, per_sample=True),
            _slice_level_dict(all_preds[6], is_df=True, per_sample=True),
            (_slice_level_dict(all_preds[7], per_sample=True)
             if _has(all_preds[7].get(0)) else all_preds[7]),
        ]

    if rows == 1:
        ax = np.asarray([ax])
    ax = np.atleast_2d(ax)

    ctx = _Ctx(b2, p2, a2, latent_levels, grid_size, fig)
    # jdet from the *unsliced* final dfs, then sliced (reference computes
    # it on the sliced 2D field; we keep the 3D determinant and slice —
    # see DIVERGENCES.md on vis_jdet)
    ctx._jdet = {}
    for l, v in preds[6].items():
        jd = np.asarray(jacobian_det(np.asarray(v)))[0]
        ctx._jdet[l] = jd[:, jd.shape[1] // 2, :] if jd.ndim == 3 else jd

    for r, row in enumerate(visualizations):
        fn = ROW_MENU[row] if isinstance(row, str) else row
        fn(ctx, ax[r], **rowparams.get(r, {}))
        for c in range(4):
            ax[r][c].set_xticks([])
            ax[r][c].set_yticks([])

    if save_path is not None:
        fig.savefig(save_path, dpi=60)
    if show:  # pragma: no cover
        plt.show()
    plt.close(fig)
    return fig


def visualize_prediction(batch, preds, all_preds, latent_levels: int,
                         title: str = "", save_path=None, grid_size: int = 20,
                         max_samples: int = 4):
    """Default-menu figure for one prediction (the standard figure
    emitted by run_one_model, evaluate.py:1613-1697)."""
    segs = _has(batch.get("seg_x")) and _has(preds[2])
    has_uq = bool(all_preds)
    has_sample_segs = has_uq and _has(all_preds[7].get(0))
    rows, rowparams = default_visualizations(segs, has_uq, has_sample_segs)
    if has_uq and (all_preds[4] is None or all_preds[6] is None):
        # streamed (keep_samples=False) mode: no per-sample df rows
        rows = [r for r in rows if r not in ("sample_dfs",)]
    return visualize(batch, preds, rows, all_preds=all_preds,
                     rowparams=rowparams, latent_levels=latent_levels,
                     grid_size=grid_size, title=title, save_path=save_path)
