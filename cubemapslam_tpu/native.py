"""ctypes bindings for the native C++ runtime pieces.

The compute path is JAX/XLA/Pallas; the IO runtime around it is native C++
(native/dataloader.cpp): a worker-pool prefetching image loader with ordered
delivery, replacing the reference's blocking cv::imread on the tracking
thread (cubemap_lafida.cpp:134). The shared library is built on demand with
g++ (pybind11 is not in the image; the C ABI + ctypes is the binding layer).
Falls back to a synchronous PIL loader when the toolchain or libpng/libjpeg
are unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, List, Optional, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SRC = os.path.join(_REPO, "native", "dataloader.cpp")
_BUILD_DIR = os.path.join(_REPO, "native", "_build")
_SO = os.path.join(_BUILD_DIR, "libcubemap_dataloader.so")


def _build() -> Optional[str]:
    if os.path.exists(_SO) and (os.path.getmtime(_SO)
                                >= os.path.getmtime(_SRC)):
        return _SO
    os.makedirs(_BUILD_DIR, exist_ok=True)
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           _SRC, "-o", _SO, "-lpng", "-ljpeg", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _SO
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    so = _build()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.dl_create.restype = ctypes.c_void_p
    lib.dl_create.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                              ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.dl_next.restype = ctypes.c_int
    lib.dl_next.argtypes = [ctypes.c_void_p,
                            ctypes.POINTER(ctypes.c_int),
                            ctypes.POINTER(ctypes.c_int)]
    lib.dl_copy.restype = None
    lib.dl_copy.argtypes = [ctypes.c_void_p,
                            ctypes.POINTER(ctypes.c_float)]
    lib.dl_destroy.restype = None
    lib.dl_destroy.argtypes = [ctypes.c_void_p]
    lib.wp_create.restype = ctypes.c_void_p
    lib.wp_create.argtypes = [ctypes.POINTER(ctypes.c_int32),
                              ctypes.POINTER(ctypes.c_float),
                              ctypes.c_int, ctypes.c_int]
    lib.wp_apply.restype = None
    lib.wp_apply.argtypes = [ctypes.c_void_p,
                             ctypes.POINTER(ctypes.c_float),
                             ctypes.POINTER(ctypes.c_float), ctypes.c_int]
    lib.wp_apply_u8.restype = None
    lib.wp_apply_u8.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_float),
                                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
    lib.wp_destroy.restype = None
    lib.wp_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class NativeImageLoader:
    """Ordered prefetching grayscale loader over the native worker pool."""

    def __init__(self, paths: List[str], n_workers: int = 4,
                 queue_cap: int = 8):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native dataloader unavailable")
        self._lib = lib
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._handle = lib.dl_create(arr, len(self._paths), n_workers,
                                     queue_cap)
        self._n = len(paths)
        self._served = 0

    def __iter__(self) -> Iterator[Tuple[int, Optional[np.ndarray]]]:
        return self

    def __next__(self):
        if self._handle is None or self._served >= self._n:
            raise StopIteration
        w = ctypes.c_int()
        h = ctypes.c_int()
        rc = self._lib.dl_next(self._handle, ctypes.byref(w),
                               ctypes.byref(h))
        idx = self._served
        self._served += 1
        if rc == 0:
            raise StopIteration
        if rc < 0:
            return idx, None  # decode failure: caller may fall back
        out = np.empty((h.value, w.value), np.float32)
        self._lib.dl_copy(self._handle,
                          out.ctypes.data_as(
                              ctypes.POINTER(ctypes.c_float)))
        return idx, out

    def close(self):
        if self._handle is not None:
            self._lib.dl_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class FallbackImageLoader:
    """Synchronous PIL loader with the same iterator interface."""

    def __init__(self, paths: List[str], **_):
        self._paths = paths
        self._i = 0

    def __iter__(self):
        return self

    def __next__(self):
        if self._i >= len(self._paths):
            raise StopIteration
        from PIL import Image
        idx = self._i
        self._i += 1
        try:
            img = np.asarray(
                Image.open(self._paths[idx]).convert("L"), np.float32)
        except Exception:
            return idx, None
        return idx, img

    def close(self):
        pass


def make_loader(paths: List[str], n_workers: int = 4, queue_cap: int = 8):
    """Best-available ordered image loader."""
    try:
        return NativeImageLoader(paths, n_workers, queue_cap)
    except (RuntimeError, OSError):
        return FallbackImageLoader(paths)


class NativeWarp:
    """Host-side fisheye->cubemap warp over the precomputed bilinear plan
    (the reference's cv::remap architecture; overlappable with device
    compute). Built from a warp.WarpMap."""

    # cross layout: face i -> (x, y) cell offsets in face units
    # (front, left, right, upper, lower — CamModelGeneral cpp:109-150)
    FACE_CELLS = ((1, 1), (0, 1), (2, 1), (1, 0), (1, 2))

    def __init__(self, warp_map, n_threads: int = 4):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native warp unavailable")
        self._lib = lib
        idx = np.ascontiguousarray(np.asarray(warp_map.idx00,
                                              np.int32).reshape(-1))
        w = np.ascontiguousarray(np.asarray(warp_map.w,
                                            np.float32).reshape(-1))
        self._shape = tuple(np.asarray(warp_map.idx00).shape)
        self._src_w = int(np.asarray(warp_map.src_wh)[0])
        self._n_threads = n_threads
        self._plan = lib.wp_create(
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            w.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            idx.size, self._src_w)
        # face-packed plan: only the 5 valid cross cells (5/9 of the pixels),
        # in face order, so faces() emits a (5, FH, FW) u8 tensor directly
        H, W = self._shape
        fh, fw = H // 3, W // 3
        self._face_hw = (fh, fw)
        idx2 = np.asarray(warp_map.idx00, np.int32)
        w2 = np.asarray(warp_map.w, np.float32)
        fi = np.concatenate([
            idx2[cy * fh:(cy + 1) * fh, cx * fw:(cx + 1) * fw].reshape(-1)
            for cx, cy in self.FACE_CELLS])
        fwt = np.concatenate([
            w2[cy * fh:(cy + 1) * fh, cx * fw:(cx + 1) * fw].reshape(-1, 4)
            for cx, cy in self.FACE_CELLS]).reshape(-1)
        fi = np.ascontiguousarray(fi)
        fwt = np.ascontiguousarray(fwt)
        self._face_plan = lib.wp_create(
            fi.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            fwt.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            fi.size, self._src_w)

    def __call__(self, fisheye: np.ndarray) -> np.ndarray:
        src = np.ascontiguousarray(fisheye, np.float32)
        out = np.empty(self._shape, np.float32)
        self._lib.wp_apply(
            self._plan,
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._n_threads)
        return out

    def faces(self, fisheye: np.ndarray) -> np.ndarray:
        """Warp directly into (5, FH, FW) uint8 face stack (front, left,
        right, upper, lower) — the device step's upload format. Skips the
        4/9 dead cross corners and the float->u8 pass."""
        src = np.ascontiguousarray(fisheye, np.float32)
        fh, fw = self._face_hw
        out = np.empty((5, fh, fw), np.uint8)
        self._lib.wp_apply_u8(
            self._face_plan,
            src.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            self._n_threads)
        return out

    def close(self):
        if self._plan is not None:
            self._lib.wp_destroy(self._plan)
            self._plan = None
        if getattr(self, "_face_plan", None) is not None:
            self._lib.wp_destroy(self._face_plan)
            self._face_plan = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
