"""Evaluation figures (reference: evaluate.py:430-526, 679-1138).

A multi-row matplotlib figure driver with the reference's row types:
x/pred/y (+flow), per-level predictions, diffs, per-level final/combined/
individual DFs (flow colorization + warped-grid overlay), JDet heatmaps,
per-level variance heatmaps, and sample grids. 3D volumes are sliced at
the middle of spatial axis -2 with DF channels (0, ndims-1), matching
the reference's convention (evaluate.py:697-776).
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
    if img.ndim == 3 and img.shape[-1] == 1:
        img = img[..., 0]
    ax.imshow(img, cmap=cmap)
    ax.set_axis_off()
    if title:
        ax.set_title(title, fontsize=8)


def create_warped_grid(df2d: np.ndarray, grid_size: int = 20):
    """Sparse control grid displaced by -df at the grid points
    (evaluate.py:430-526 equivalent, b-spline smoothed when scipy is
    available). df2d: (H, W, 2). Returns list of polylines."""
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

    for yv in ys:
        pts = []
        for xv in xs:
            iy, ix = int(round(yv)), int(round(xv))
            d = df2d[iy, ix]
            pts.append([xv - d[1], yv - d[0]])
        lines.append(smooth(np.asarray(pts)))
    for xv in xs:
        pts = []
        for yv in ys:
            iy, ix = int(round(yv)), int(round(xv))
            d = df2d[iy, ix]
            pts.append([xv - d[1], yv - d[0]])
        lines.append(smooth(np.asarray(pts)))
    return lines


def _plot_grid(ax, df2d, grid_size=20, color="c", lw=0.4):
    from matplotlib.collections import LineCollection

    lines = create_warped_grid(df2d, grid_size)
    ax.add_collection(LineCollection(lines, colors=color, linewidths=lw))


def visualize_prediction(batch, preds, all_preds, latent_levels: int,
                         title: str = "", save_path=None, grid_size: int = 20):
    """Multi-row summary figure for one prediction.

    Rows: [x | pred | y | |pred-y|], per-level preds, per-level final DF
    (flow color + warped grid), per-level individual DF, JDet heatmap,
    and when all_preds is present: per-level output/individual/final std
    heatmaps + sample grid.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    (y_pred, df_pred, seg_pred, outputs, individual_dfs, combined_dfs,
     final_dfs, warped_seg, pred_name) = preds

    has_uq = bool(all_preds)
    rows = 4 + (3 if has_uq else 0)
    cols = max(4, latent_levels)
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 3 * rows))
    axes = np.atleast_2d(axes)
    loader_name = batch.get("loader", "?")
    fig.suptitle(f"{title}. {pred_name} on the {loader_name} set.", fontsize=12)

    x2 = _slice2d(batch["x"])
    y2 = _slice2d(batch["y"])
    p2 = _slice2d(y_pred)
    _imshow(axes[0, 0], x2, title="x (moving)")
    _imshow(axes[0, 1], p2, title="prediction")
    _imshow(axes[0, 2], y2, title="y (fixed)")
    _imshow(axes[0, 3], np.abs(p2 - y2), cmap="viridis", title="|pred - y|")

    for l in range(latent_levels):
        _imshow(axes[1, l], _slice2d(outputs[l]), title=f"pred level {l}")

        df2 = _slice2d(final_dfs[l], is_df=True)
        _imshow(axes[2, l], flow_to_image(df2[None])[0], title=f"final DF level {l}")
        _plot_grid(axes[2, l], df2, grid_size)

        jd = np.asarray(jacobian_det(np.asarray(final_dfs[l])))
        jd2 = _slice2d(jd[..., None])
        im = axes[3, l].imshow(jd2[..., 0] if jd2.ndim == 3 else jd2, cmap="coolwarm")
        axes[3, l].set_axis_off()
        axes[3, l].set_title(f"JDet level {l}", fontsize=8)
        fig.colorbar(im, ax=axes[3, l], fraction=0.04)

    if has_uq:
        output_std, individual_df_std, final_df_std = all_preds[0], all_preds[1], all_preds[2]
        all_outputs = all_preds[3]
        img2 = x2[..., 0] if x2.ndim == 3 else x2
        for l in range(latent_levels):
            for r, (name, std_map) in enumerate(
                (("output std", output_std), ("individual DF std", individual_df_std),
                 ("final DF std", final_df_std))
            ):
                s = np.asarray(std_map[l])[0]
                if s.ndim == 3:  # 3D: middle slice of axis -2
                    s = s[:, s.shape[1] // 2, :]
                # mask where the image is zero (reference heatmap masking)
                ax = axes[4 + r, l]
                im = ax.imshow(s, cmap="hot")
                ax.set_axis_off()
                ax.set_title(f"{name} level {l}", fontsize=8)
                fig.colorbar(im, ax=ax, fraction=0.04)

    fig.tight_layout()
    if save_path is not None:
        fig.savefig(save_path, dpi=80)
    plt.close(fig)
    return fig
