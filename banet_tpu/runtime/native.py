"""ctypes bindings for the native runtime (banet_tpu/runtime/loader.cpp).

The library is built on demand with `make` on first use (g++ + libpng
are part of the target image).  Every entry point has a pure-Python
fallback (PIL + numpy via data/) so the framework never hard-fails
without the native path — it just loads data slower.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libbanet_runtime.so")
_lib = None
_lib_lock = threading.Lock()


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) <
                os.path.getmtime(os.path.join(_DIR, "loader.cpp"))):
            try:
                subprocess.run(["make", "-C", _DIR], check=True,
                               capture_output=True)
            except (subprocess.CalledProcessError, FileNotFoundError):
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.png_dims.argtypes = [ctypes.c_char_p] + [
            ctypes.POINTER(ctypes.c_int)] * 4
        lib.decode_rgb.argtypes = [ctypes.c_char_p,
                                   ctypes.POINTER(ctypes.c_float),
                                   ctypes.c_int, ctypes.c_int]
        lib.decode_depth16.argtypes = [ctypes.c_char_p,
                                       ctypes.POINTER(ctypes.c_float),
                                       ctypes.c_int, ctypes.c_int,
                                       ctypes.c_float]
        lib.prefetcher_create.restype = ctypes.c_void_p
        lib.prefetcher_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_int, ctypes.c_int]
        lib.prefetcher_next.argtypes = [ctypes.c_void_p,
                                        ctypes.POINTER(ctypes.c_float),
                                        ctypes.POINTER(ctypes.c_float)]
        lib.prefetcher_destroy.argtypes = [ctypes.c_void_p]
        lib.sobel_select_points.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_int,
            ctypes.c_uint64, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float)]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def png_dims(path: str) -> Tuple[int, int, int, int]:
    """(height, width, channels, bit_depth)."""
    lib = _load()
    if lib is None:
        from PIL import Image

        with Image.open(path) as im:
            c = len(im.getbands())
            bd = 16 if im.mode.startswith("I") else 8
            return im.height, im.width, c, bd
    h, w, c, bd = (ctypes.c_int() for _ in range(4))
    rc = lib.png_dims(path.encode(), ctypes.byref(h), ctypes.byref(w),
                      ctypes.byref(c), ctypes.byref(bd))
    if rc != 0:
        raise IOError(f"png_dims({path}) failed: {rc}")
    return h.value, w.value, c.value, bd.value


def decode_rgb(path: str, height: int, width: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        from PIL import Image

        return np.asarray(Image.open(path).convert("RGB"), np.float32)
    out = np.empty((height, width, 3), np.float32)
    rc = lib.decode_rgb(path.encode(), _fptr(out), height, width)
    if rc != 0:
        raise IOError(f"decode_rgb({path}) failed: {rc}")
    return out


def decode_depth(path: str, height: int, width: int,
                 scale: float = 5000.0) -> np.ndarray:
    lib = _load()
    if lib is None:
        from PIL import Image

        return np.asarray(Image.open(path), np.float32) / scale
    out = np.empty((height, width), np.float32)
    rc = lib.decode_depth16(path.encode(), _fptr(out), height, width,
                            scale)
    if rc != 0:
        raise IOError(f"decode_depth({path}) failed: {rc}")
    return out


class Prefetcher:
    """Threaded in-order (rgb, depth) frame prefetcher.

    Usage:
        with Prefetcher(rgb_paths, depth_paths, H, W) as pf:
            for rgb, depth in pf:
                ...
    Falls back to synchronous PIL decoding without the native library.
    """

    def __init__(self, rgb_paths: Sequence[str],
                 depth_paths: Optional[Sequence[str]],
                 height: int, width: int, depth_scale: float = 5000.0,
                 num_threads: int = 4, capacity: int = 8):
        self.rgb_paths = list(rgb_paths)
        self.depth_paths = (list(depth_paths) if depth_paths is not None
                            else None)
        self.height, self.width = height, width
        self.depth_scale = depth_scale
        self._lib = _load()
        self._handle = None
        if self._lib is not None:
            n = len(self.rgb_paths)
            rgb_arr = (ctypes.c_char_p * n)(
                *[p.encode() for p in self.rgb_paths])
            if self.depth_paths is not None:
                dep_arr = (ctypes.c_char_p * n)(
                    *[p.encode() for p in self.depth_paths])
            else:
                dep_arr = (ctypes.c_char_p * n)(*([b""] * n))
            self._handle = self._lib.prefetcher_create(
                rgb_arr, dep_arr, n, height, width, depth_scale,
                num_threads, capacity)
        self._idx = 0

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def close(self):
        if self._handle is not None:
            self._lib.prefetcher_destroy(self._handle)
            self._handle = None

    def __iter__(self):
        return self

    def __next__(self) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        if self._idx >= len(self.rgb_paths):
            raise StopIteration
        i = self._idx
        self._idx += 1
        want_depth = self.depth_paths is not None
        if self._handle is not None:
            rgb = np.empty((self.height, self.width, 3), np.float32)
            depth = np.empty((self.height, self.width), np.float32)
            rc = self._lib.prefetcher_next(self._handle, _fptr(rgb),
                                           _fptr(depth))
            if rc != 0:
                raise IOError(
                    f"prefetcher_next failed at frame {i}: {rc}")
            return rgb, (depth if want_depth else None)
        # Fallback: synchronous PIL.
        from PIL import Image

        rgb = np.asarray(Image.open(self.rgb_paths[i]).convert("RGB"),
                         np.float32)
        depth = None
        if want_depth:
            depth = np.asarray(Image.open(self.depth_paths[i]),
                               np.float32) / self.depth_scale
        return rgb, depth


def sobel_select_points(rgb: np.ndarray, depth: np.ndarray,
                        num_points: int, texture_threshold: float = 120.0,
                        min_depth: float = 1e-5, seed: int = 1
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Native point selection; same contract as data.points.select_points
    (returns points (1, N, 2), depths (1, N, 1))."""
    lib = _load()
    if lib is None:
        from banet_tpu.data.points import select_points

        return select_points(rgb, depth, num_points, texture_threshold,
                             min_depth,
                             rng=np.random.default_rng(seed))
    rgb = np.ascontiguousarray(rgb, np.float32)
    depth = np.ascontiguousarray(depth, np.float32)
    H, W = depth.shape
    pts = np.empty((num_points, 2), np.float32)
    ds = np.empty((num_points,), np.float32)
    rc = lib.sobel_select_points(_fptr(rgb), _fptr(depth), H, W,
                                 texture_threshold, min_depth, num_points,
                                 seed, _fptr(pts), _fptr(ds))
    if rc < 0:
        raise ValueError("no depth-valid pixels to select points from")
    return pts[None], ds[None, :, None]
