"""Native (C++) data-loading engine with ctypes bindings.

Builds pulpo_tpu/native/dataloader.cc into _dataloader.so on first use
(cached; g++ is part of the TPU image). Falls back gracefully: callers
should catch NativeUnavailable and use the pure-Python loader.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess

import numpy as np

_DIR = pathlib.Path(__file__).parent
_SRC = _DIR / "dataloader.cc"
_SO = _DIR / "_dataloader.so"

MAGIC = 0x50554C504F424C4F


class NativeUnavailable(RuntimeError):
    pass


def _build() -> pathlib.Path:
    if _SO.exists() and _SO.stat().st_mtime >= _SRC.stat().st_mtime:
        return _SO
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
           str(_SRC), "-o", str(_SO)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        msg = getattr(e, "stderr", str(e))
        raise NativeUnavailable(f"building native loader failed: {msg}") from e
    return _SO


_lib = None


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(str(_build()))
        lib.dl_open.restype = ctypes.c_void_p
        lib.dl_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
        lib.dl_shape.argtypes = [ctypes.c_void_p,
                                 ctypes.POINTER(ctypes.c_uint64),
                                 ctypes.POINTER(ctypes.c_uint64)]
        lib.dl_len.restype = ctypes.c_uint64
        lib.dl_len.argtypes = [ctypes.c_void_p]
        lib.dl_start_epoch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_uint64, ctypes.c_uint64, ctypes.c_int]
        lib.dl_next.restype = ctypes.c_int
        lib.dl_next.argtypes = [ctypes.c_void_p] + [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float))] * 4 + [
            ctypes.POINTER(ctypes.c_long)] * 2
        lib.dl_release.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.dl_close.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


def write_volume_store(path, volumes: np.ndarray, segs: np.ndarray | None = None,
                       num_classes: int = 0):
    """Write the binary volume store: header + f32 volumes [+ int16 labels]."""
    volumes = np.ascontiguousarray(volumes, dtype=np.float32)
    n = volumes.shape[0]
    shape = volumes.shape[1:]
    assert len(shape) == 3
    seg_flag = num_classes if segs is not None else 0
    header = np.zeros(8, dtype=np.uint64)
    header[0] = MAGIC
    header[1] = n
    header[2:5] = shape
    header[5] = seg_flag
    with open(path, "wb") as f:
        f.write(header.tobytes())
        f.write(volumes.tobytes())
        if segs is not None:
            f.write(np.ascontiguousarray(segs, dtype=np.int16).tobytes())
    return path


class NativeDataset:
    """Pair-serving dataset over a volume store; mirrors the Python
    loaders' epoch iteration but copies/one-hots in C++ threads."""

    def __init__(self, path, segs: bool = False, n_slots: int = 4,
                 n_threads: int = 2, seed: int = 0):
        lib = _load()
        self._lib = lib
        self._h = lib.dl_open(str(path).encode(), int(segs), n_slots)
        if not self._h:
            raise NativeUnavailable(f"dl_open failed for {path}")
        shape = (ctypes.c_uint64 * 3)()
        classes = ctypes.c_uint64()
        lib.dl_shape(self._h, shape, ctypes.byref(classes))
        self.input_size = tuple(int(s) for s in shape)
        self.num_classes = int(classes.value)
        self.segs = segs and self.num_classes > 0
        self.n_threads = n_threads
        self.seed = seed
        self._epoch = 0

    def __len__(self):
        return int(self._lib.dl_len(self._h))

    def epoch(self, shuffle: bool = True, seed: int | None = None):
        """Iterate one epoch of pair items (dicts of numpy arrays)."""
        n = len(self)
        rng = np.random.default_rng((self.seed if seed is None else seed,
                                     self._epoch))
        order = (rng.permutation(n) if shuffle else np.arange(n)).astype(np.uint32)
        self._epoch += 1
        lib = self._lib
        lib.dl_start_epoch(
            self._h, order.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            n, int(rng.integers(0, 2**63 - 1)), self.n_threads)

        voxels = int(np.prod(self.input_size))
        fp = ctypes.POINTER(ctypes.c_float)
        while True:
            x_p, y_p, sx_p, sy_p = fp(), fp(), fp(), fp()
            i1, i2 = ctypes.c_long(), ctypes.c_long()
            slot = lib.dl_next(self._h, ctypes.byref(x_p), ctypes.byref(y_p),
                               ctypes.byref(sx_p), ctypes.byref(sy_p),
                               ctypes.byref(i1), ctypes.byref(i2))
            if slot < 0:
                return
            # copy out (the slot is recycled after release)
            item = {
                "x": np.ctypeslib.as_array(x_p, (voxels,)).reshape(
                    *self.input_size, 1).copy(),
                "y": np.ctypeslib.as_array(y_p, (voxels,)).reshape(
                    *self.input_size, 1).copy(),
                "seg_x": None, "seg_y": None,
                "lm_x": None, "lm_y": None, "mask_x": None, "mask_y": None,
            }
            if self.segs and sx_p:
                c = self.num_classes
                item["seg_x"] = np.ctypeslib.as_array(sx_p, (voxels * c,)).reshape(
                    *self.input_size, c).copy()
                item["seg_y"] = np.ctypeslib.as_array(sy_p, (voxels * c,)).reshape(
                    *self.input_size, c).copy()
            lib.dl_release(self._h, slot)
            yield item

    def get_pair(self, index: int, rng: np.random.Generator):
        """Random-access single pair (DataLoader protocol compat)."""
        # serve one item deterministically by driving a 1-item epoch
        order = np.asarray([index], dtype=np.uint32)
        self._lib.dl_start_epoch(
            self._h, order.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
            1, int(rng.integers(0, 2**63 - 1)), 1)
        for item in self._drain_started_epoch():
            return item

    def _drain_started_epoch(self):
        voxels = int(np.prod(self.input_size))
        fp = ctypes.POINTER(ctypes.c_float)
        lib = self._lib
        while True:
            x_p, y_p, sx_p, sy_p = fp(), fp(), fp(), fp()
            i1, i2 = ctypes.c_long(), ctypes.c_long()
            slot = lib.dl_next(self._h, ctypes.byref(x_p), ctypes.byref(y_p),
                               ctypes.byref(sx_p), ctypes.byref(sy_p),
                               ctypes.byref(i1), ctypes.byref(i2))
            if slot < 0:
                return
            item = {
                "x": np.ctypeslib.as_array(x_p, (voxels,)).reshape(
                    *self.input_size, 1).copy(),
                "y": np.ctypeslib.as_array(y_p, (voxels,)).reshape(
                    *self.input_size, 1).copy(),
                "seg_x": None, "seg_y": None,
                "lm_x": None, "lm_y": None, "mask_x": None, "mask_y": None,
            }
            if self.segs and sx_p:
                c = self.num_classes
                item["seg_x"] = np.ctypeslib.as_array(sx_p, (voxels * c,)).reshape(
                    *self.input_size, c).copy()
                item["seg_y"] = np.ctypeslib.as_array(sy_p, (voxels * c,)).reshape(
                    *self.input_size, c).copy()
            lib.dl_release(self._h, slot)
            yield item

    def close(self):
        if self._h:
            self._lib.dl_close(self._h)
            self._h = None


def convert_h5_to_store(h5_path, split: str, out_path, with_segs: bool = False):
    """OASIS.h5-schema split -> native volume store."""
    import h5py

    with h5py.File(h5_path, "r") as f:
        g = f[split]
        n = int(g.attrs["N"])
        vols = np.stack([np.asarray(g["image"][str(i)], np.float32) for i in range(n)])
        segs = None
        classes = 0
        if with_segs and "seg" in g and len(g["seg"]) == n:
            segs = np.stack([np.asarray(g["seg"][str(i)], np.int16) for i in range(n)])
            classes = int(g.attrs.get("seg_dim", int(segs.max()) + 1))
    return write_volume_store(out_path, vols, segs, classes)
