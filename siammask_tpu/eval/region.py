"""VOT region overlap: Python binding over the C++ kernel (csrc/region_overlap.cpp).

Drop-in equivalents of the reference Cython API (`utils/pysot/utils/region.pyx` /
`utils/pyvotkit/region.pyx`): ``vot_overlap``, ``vot_overlap_traj``,
``vot_float2str``. Rect 4-tuples are expanded to 4-point polygons exactly as the
wrapper does (region.pyx:163-177); 1-length "special" regions give NaN.

The shared library is compiled on first use (g++ -O2) and cached next to this file.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_CSRC = Path(__file__).resolve().parents[2] / "csrc" / "region_overlap.cpp"
_SO = Path(__file__).resolve().parent / "_region_overlap.so"

_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if (not _SO.exists()) or _SO.stat().st_mtime < _CSRC.stat().st_mtime:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
             str(_CSRC), "-o", str(_SO)],
            check=True, capture_output=True)
    lib = ctypes.CDLL(str(_SO))
    lib.region_polygon_overlap.restype = ctypes.c_float
    lib.region_polygon_overlap.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float]
    lib.region_rasterize.restype = ctypes.c_int
    lib.region_rasterize.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.POINTER(ctypes.c_char), ctypes.c_int, ctypes.c_int]
    _lib = lib
    return lib


def _to_polygon(region) -> tuple[np.ndarray, np.ndarray]:
    """Region -> (xs, ys). Accepts BOTH reference conventions: the pysot flat
    list (len 4 = xywh rect, len 2N = polygon coords, region.pyx:151-230) and
    the pyvotkit sequence of (x, y) point tuples (pyvotkit/region.pyx:107-123
    — what the online tracker passes, tools/test.py:344-354)."""
    arr = np.asarray(list(region), dtype=np.float32)
    if arr.ndim == 2:                      # point-pair convention
        return (np.ascontiguousarray(arr[:, 0]),
                np.ascontiguousarray(arr[:, 1]))
    if len(arr) == 4:                      # flat xywh rect
        x, y, w, h = arr
        arr = np.asarray([x, y, x + w, y, x + w, y + h, x, y + h], np.float32)
    return np.ascontiguousarray(arr[0::2]), np.ascontiguousarray(arr[1::2])


def _bounds_tuple(bounds):
    if bounds is not None and len(bounds) == 4:
        return tuple(float(v) for v in bounds)  # (top, bottom, left, right)
    if bounds is not None and len(bounds) == 2:
        # (width, height) -> top 0, bottom height, left 0, right width
        return (0.0, float(bounds[1]), 0.0, float(bounds[0]))
    return (-3.4e38, 3.4e38, -3.4e38, 3.4e38)


def vot_overlap(polygon1, polygon2, bounds=None) -> float:
    """Overlap (IoU on the protocol's integer raster) between two regions."""
    if len(polygon1) == 1 or len(polygon2) == 1:
        return float("nan")
    lib = _load()
    x1, y1 = _to_polygon(polygon1)
    x2, y2 = _to_polygon(polygon2)
    top, bottom, left, right = _bounds_tuple(bounds)
    fp = ctypes.POINTER(ctypes.c_float)
    return lib.region_polygon_overlap(
        x1.ctypes.data_as(fp), y1.ctypes.data_as(fp), len(x1),
        x2.ctypes.data_as(fp), y2.ctypes.data_as(fp), len(x2),
        top, bottom, left, right)


def vot_overlap_traj(polygons1, polygons2, bounds=None) -> list[float]:
    assert len(polygons1) == len(polygons2)
    return [vot_overlap(a, b, bounds=bounds)
            for a, b in zip(polygons1, polygons2)]


def rasterize_polygon(polygon, width: int, height: int) -> np.ndarray:
    """Rasterize one polygon to a (height, width) uint8 mask (protocol grid)."""
    lib = _load()
    x, y = _to_polygon(polygon)
    mask = np.zeros((height, width), dtype=np.uint8)
    fp = ctypes.POINTER(ctypes.c_float)
    lib.region_rasterize(x.ctypes.data_as(fp), y.ctypes.data_as(fp), len(x),
                         mask.ctypes.data_as(ctypes.POINTER(ctypes.c_char)),
                         width, height)
    return mask


def vot_float2str(template: str, value: float) -> str:
    """printf-style float formatting used by VOT result writers."""
    return template % value
