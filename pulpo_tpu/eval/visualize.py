"""Evaluation figures (reference: evaluate.py:430-526, 679-1138).

A multi-row matplotlib figure driver with the reference's row types:
x/pred/y + diffs, seg triplet, per-level predictions, per-level
final/combined/individual DFs (flow colorization + warped-grid overlay),
JDet heatmaps, per-level std heatmaps (masked where the image is 0), and
per-sample grids. 3D volumes are sliced at the middle of spatial axis -2
with DF channels (0, ndims-1), matching evaluate.py:697-776.
"""

from __future__ import annotations

import numpy as np

from pulpo_tpu.eval.flow_viz import flow_to_image
from pulpo_tpu.ops.losses import jacobian_det


def _slice2d(a, is_df=False):
    """(B, *spatial, C) -> (H, W[, C']) middle slice of axis -2 (3D)."""
    a = np.asarray(a)
    if a.ndim == 5:  # (B, D, H, W, C)
        a = a[:, :, a.shape[2] // 2, :, :]
        if is_df and a.shape[-1] == 3:
            a = np.stack([a[..., 0], a[..., 2]], axis=-1)
    return a[0]


def _imshow(ax, img, cmap="gray", title=None):
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[-1] == 1:
        img = img[..., 0]
    ax.imshow(img, cmap=cmap)
    ax.set_axis_off()
    if title:
        ax.set_title(title, fontsize=8)


def _seg2d(seg):
    """One-hot (B, *spatial, C) -> label map slice for display."""
    seg = np.asarray(seg)
    lab = np.argmax(seg, axis=-1)[..., None].astype(np.float32)
    return _slice2d(lab)


def create_warped_grid(df2d: np.ndarray, grid_size: int = 20):
    """Sparse control grid displaced by -df at the grid points
    (evaluate.py:430-526), b-spline smoothed via scipy when available.
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


def _plot_grid(ax, df2d, grid_size=20, color="c", lw=0.4):
    from matplotlib.collections import LineCollection

    ax.add_collection(LineCollection(create_warped_grid(df2d, grid_size),
                                     colors=color, linewidths=lw))


def _df_row(fig, axes_row, dfs, latent_levels, name, grid_size):
    for l in range(latent_levels):
        df2 = _slice2d(dfs[l], is_df=True)
        _imshow(axes_row[l], flow_to_image(df2[None])[0], title=f"{name} level {l}")
        _plot_grid(axes_row[l], df2, grid_size)


def _std_row(fig, axes_row, std_map, latent_levels, name, mask2d=None):
    for l in range(latent_levels):
        s = np.asarray(std_map[l])[0]
        if s.ndim == 3:
            s = s[:, s.shape[1] // 2, :]
        if mask2d is not None and mask2d.shape == s.shape:
            s = np.where(mask2d == 0, 0.0, s)  # mask where image==0
        im = axes_row[l].imshow(s, cmap="hot")
        axes_row[l].set_axis_off()
        axes_row[l].set_title(f"{name} level {l}", fontsize=8)
        fig.colorbar(im, ax=axes_row[l], fraction=0.04)


def visualize_prediction(batch, preds, all_preds, latent_levels: int,
                         title: str = "", save_path=None, grid_size: int = 20,
                         max_samples: int = 4):
    """Multi-row summary figure for one prediction (the reference's
    `visualize` with its standard row menu, evaluate.py:1613-1697)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    (y_pred, df_pred, seg_pred, outputs, individual_dfs, combined_dfs,
     final_dfs, warped_seg, pred_name) = preds

    has_uq = bool(all_preds)
    has_segs = (
        batch.get("seg_x") is not None
        and np.asarray(seg_pred).size > 0
    )
    n_samples = 0
    if has_uq and all_preds[3] is not None:
        n_samples = min(max_samples, next(iter(all_preds[3].values())).shape[0])

    rows = 6 + (1 if has_segs else 0) + (3 + (1 if n_samples else 0) if has_uq else 0)
    cols = max(4, latent_levels, n_samples)
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows))
    axes = np.atleast_2d(axes)
    loader_name = batch.get("loader", "?")
    fig.suptitle(f"{title}. {pred_name} on the {loader_name} set.", fontsize=12)
    for ax in axes.flat:
        ax.set_axis_off()

    x2 = _slice2d(batch["x"])
    y2 = _slice2d(batch["y"])
    p2 = _slice2d(y_pred)
    r = 0
    # row: x | pred | y | |x - pred| (vis_x_pred_y + vis_diff_input_pred)
    _imshow(axes[r, 0], x2, title="x (moving)")
    _imshow(axes[r, 1], p2, title="prediction")
    _imshow(axes[r, 2], y2, title="y (fixed)")
    _imshow(axes[r, 3], np.abs(x2 - p2), cmap="viridis", title="|x - pred|")
    r += 1

    if has_segs:
        _imshow(axes[r, 0], _seg2d(batch["seg_x"]), cmap="tab20", title="seg x")
        _imshow(axes[r, 1], _seg2d(seg_pred), cmap="tab20", title="seg pred")
        _imshow(axes[r, 2], _seg2d(batch["seg_y"]), cmap="tab20", title="seg y")
        r += 1

    # row: |pred - y| + per-level preds (vis_diff_target_pred + vis_pred_per_level)
    _imshow(axes[r, 0], np.abs(p2 - y2), cmap="viridis", title="|pred - y|")
    for l in range(latent_levels):
        if l + 1 < cols:
            _imshow(axes[r, l + 1], _slice2d(outputs[l]), title=f"pred level {l}")
    r += 1

    _df_row(fig, axes[r], final_dfs, latent_levels, "final DF", grid_size)
    r += 1
    _df_row(fig, axes[r], combined_dfs, latent_levels, "combined DF", grid_size)
    r += 1
    # individual DFs + JDet heatmaps interleave on the last base rows
    for l in range(latent_levels):
        df2 = _slice2d(individual_dfs[l], is_df=True)
        _imshow(axes[r, l], flow_to_image(df2[None])[0],
                title=f"individual DF level {l}")
    r += 1

    # JDet heatmap row (vis_jdet)
    if r < rows:
        for l in range(latent_levels):
            jd = np.asarray(jacobian_det(np.asarray(final_dfs[l])))[0]
            if jd.ndim == 3:
                jd = jd[:, jd.shape[1] // 2, :]
            im = axes[r, l].imshow(jd, cmap="coolwarm")
            axes[r, l].set_axis_off()
            axes[r, l].set_title(f"JDet level {l}", fontsize=8)
            fig.colorbar(im, ax=axes[r, l], fraction=0.04)
        r += 1

    if has_uq:
        output_std, individual_df_std, final_df_std = (
            all_preds[0], all_preds[1], all_preds[2])
        mask2d = x2[..., 0] if x2.ndim == 3 else x2
        _std_row(fig, axes[r], output_std, latent_levels, "output std",
                 mask2d=mask2d)
        r += 1
        _std_row(fig, axes[r], individual_df_std, latent_levels,
                 "individual DF std")
        r += 1
        _std_row(fig, axes[r], final_df_std, latent_levels, "final DF std")
        r += 1
        if n_samples and r < rows:
            all_outputs = all_preds[3]
            for i in range(n_samples):
                _imshow(axes[r, i], _slice2d(all_outputs[0][i][None]),
                        title=f"sample {i}")
            r += 1

    fig.tight_layout()
    if save_path is not None:
        fig.savefig(save_path, dpi=80)
    plt.close(fig)
    return fig
