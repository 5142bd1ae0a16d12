"""TensorBoard-compatible metric & image logging.

Replaces Lightning's TensorBoardLogger + self.log_dict
(models.py:170-186, 237-308) using tensorboardX. Image panels replicate
the reference's conventions: middle slice of spatial axis -2 for 3D,
flow_to_image for displacement fields, sqrt-grid layout.
"""

from __future__ import annotations

import numpy as np

from pulpo_tpu.eval.flow_viz import df_slice_channels, flow_to_image, make_grid, middle_slice


class MetricWriter:
    def __init__(self, log_dir):
        from tensorboardX import SummaryWriter

        self.writer = SummaryWriter(str(log_dir))

    def scalars(self, metrics: dict, step: int, prefix: str = ""):
        for k, v in metrics.items():
            if isinstance(v, dict):
                self.scalars(v, step, prefix=f"{prefix}{k}/")
            else:
                try:
                    self.writer.add_scalar(f"{prefix}{k}", float(np.asarray(v)), step)
                except (TypeError, ValueError):
                    pass

    def image_grid(self, name: str, imgs: np.ndarray, step: int):
        """(B, H, W, C) float or uint8 -> tiled grid image."""
        imgs = np.asarray(imgs)
        if imgs.dtype != np.uint8:
            lo, hi = imgs.min(), imgs.max()
            imgs = ((imgs - lo) / max(hi - lo, 1e-8) * 255).astype(np.uint8)
        if imgs.shape[-1] == 1:
            imgs = np.repeat(imgs, 3, axis=-1)
        grid = make_grid(imgs)
        self.writer.add_image(name, grid, step, dataformats="HWC")

    def log_validation_images(self, name_prefix: str, x, y, y_pred, df, step: int):
        """The reference's val image panel (models.py:265-295): x, y,
        y_pred, |distance|, colorized DF."""
        x, y, y_pred, df = (np.asarray(a) for a in (x, y, y_pred, df))
        distance = (y_pred - y + 1) / 2
        distance = np.where(distance > 1, 1.0, distance)
        is3d = x.ndim == 5
        for name, img in (("x", x), ("y", y), ("y_pred", y_pred), ("distance", distance)):
            if is3d:
                img = middle_slice(img, axis=-3)
            self.image_grid(f"{name_prefix}/{name}", img, step)
        flow = df_slice_channels(df) if is3d else df
        self.image_grid(f"{name_prefix}/DF", flow_to_image(flow), step)

    def log_level_images(self, prefix: str, y_hat, individual_dfs, final_dfs, step: int):
        """Per-level recon / individual_DF / final_DF panels
        (models.py:297-308)."""
        for l in y_hat:
            img = np.asarray(y_hat[l])
            is3d = img.ndim == 5
            if is3d:
                img = middle_slice(img, axis=-3)
            self.image_grid(f"{prefix}/recon_level_{l}", img, step)
            for nm, d in (("individual_DF", individual_dfs[l]), ("final_DF", final_dfs[l])):
                d = np.asarray(d)
                flow = df_slice_channels(d) if is3d else d
                self.image_grid(f"{prefix}/{nm}_level_{l}", flow_to_image(flow), step)

    def flush(self):
        self.writer.flush()

    def close(self):
        self.writer.close()
