"""BraTS longitudinal dataset (144x192x160 after the converter crop).

Same HDF5 layout as the reference (src/data/BraTS/brats.py): file attr
`shape`; splits training/validation/test; per-split groups `base` /
`follow`, each with `t1ce/<i>` and optional `landmarks/<i>`.

- BraTS: intra-patient, deterministic pairing — moving = follow-up t1ce,
  fixed = baseline t1ce (brats.py:58-86).
- BraTSInterpatient: random cross-patient pairing with coin-flips over
  base/follow (brats.py:111-150; minus the stray debug print).
"""

from __future__ import annotations

import os
import pathlib

import numpy as np

DEFAULT_PATH = pathlib.Path(__file__).parent / "BraTS.h5"


class BraTS:
    def __init__(self, split, segs=False, lms=False, mask=False, ndims=3, path=None):
        if segs:
            raise ValueError("Segs not implemented")
        if mask:
            raise ValueError("Mask not implemented")
        if ndims == 2:
            raise ValueError("2D not implemented")
        import h5py

        self.path = str(path or os.environ.get("PULPO_BRATS_H5", DEFAULT_PATH))
        self.split = split
        self.lms = lms
        self._f = h5py.File(self.path, "r")
        self.input_size = tuple(int(s) for s in self._f.attrs["shape"])
        self.length = int(self._f[split].attrs["N"])

    def __len__(self):
        return self.length

    def get_pair(self, index: int, rng: np.random.Generator):
        g = self._f[self.split]
        follow = np.asarray(g["follow"]["t1ce"][str(index)], dtype=np.float32)[..., None]
        base = np.asarray(g["base"]["t1ce"][str(index)], dtype=np.float32)[..., None]
        item = {"x": follow, "y": base, "seg_x": None, "seg_y": None,
                "lm_x": None, "lm_y": None, "mask_x": None, "mask_y": None}
        if self.lms:
            item["lm_x"] = np.asarray(g["follow"]["landmarks"][str(index)], dtype=np.float32)
            if self.split != "validation":
                item["lm_y"] = np.asarray(g["base"]["landmarks"][str(index)], dtype=np.float32)
        return item


class BraTSInterpatient(BraTS):
    def __init__(self, split, segs=False, lms=False, mask=False, ndims=3, path=None):
        super().__init__(split, segs=segs, lms=lms, mask=mask, ndims=ndims, path=path)
        if lms:
            # different landmark counts per patient: not batchable
            print("Landmarks don't work with interpatient pairing.")

    def get_pair(self, index: int, rng: np.random.Generator):
        g = self._f[self.split]
        coin1 = "follow" if rng.integers(0, 2) == 0 else "base"
        coin2 = "follow" if rng.integers(0, 2) == 0 else "base"
        index2 = int(rng.integers(0, self.length))
        while index2 == index and coin1 == coin2:
            index2 = int(rng.integers(0, self.length))
        moving = np.asarray(g[coin1]["t1ce"][str(index)], dtype=np.float32)[..., None]
        fixed = np.asarray(g[coin2]["t1ce"][str(index2)], dtype=np.float32)[..., None]
        return {"x": moving, "y": fixed, "seg_x": None, "seg_y": None,
                "lm_x": None, "lm_y": None, "mask_x": None, "mask_y": None}


def create_data_loaders(batch_size, segs=False, lms=False, mask=False, ndims=3,
                        interpatient=False, path=None, seed=0):
    """train / validation / test loaders (brats.py:18-37)."""
    from pulpo_tpu.data.loader import DataLoader

    cls = BraTSInterpatient if interpatient else BraTS
    train = cls("training", segs=False, lms=lms, mask=mask, ndims=ndims, path=path)
    val = cls("validation", segs=False, lms=False, mask=mask, ndims=ndims, path=path)
    test = cls("test", segs=False, lms=lms, mask=mask, ndims=ndims, path=path)
    return (
        DataLoader(train, batch_size, shuffle=True, seed=seed),
        DataLoader(val, batch_size, shuffle=False, seed=seed + 1),
        DataLoader(test, batch_size, shuffle=False, seed=seed + 2),
    )
