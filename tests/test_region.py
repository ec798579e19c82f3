"""Differential test: our C++ region kernel vs the reference C library compiled
from /root/reference (used purely as a test oracle via ctypes)."""
import ctypes
import subprocess
from pathlib import Path

import numpy as np
import pytest

from siammask_tpu.eval.region import (rasterize_polygon, vot_float2str,
                                      vot_overlap, vot_overlap_traj)


class _RefBounds(ctypes.Structure):
    _fields_ = [("top", ctypes.c_float), ("bottom", ctypes.c_float),
                ("left", ctypes.c_float), ("right", ctypes.c_float)]


class _RefPolygon(ctypes.Structure):
    _fields_ = [("count", ctypes.c_int),
                ("x", ctypes.POINTER(ctypes.c_float)),
                ("y", ctypes.POINTER(ctypes.c_float))]


@pytest.fixture(scope="module")
def ref_lib(tmp_path_factory, reference_path):
    src = reference_path / "utils" / "pysot" / "utils" / "src"
    out = tmp_path_factory.mktemp("regionlib") / "libref_region.so"
    subprocess.run(
        ["gcc", "-O2", "-shared", "-fPIC", str(src / "region.c"),
         "-I", str(src), "-o", str(out), "-lm"],
        check=True, capture_output=True)
    lib = ctypes.CDLL(str(out))
    lib.compute_polygon_overlap.restype = ctypes.c_float
    lib.compute_polygon_overlap.argtypes = [
        ctypes.POINTER(_RefPolygon), ctypes.POINTER(_RefPolygon),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        _RefBounds]
    return lib


def _ref_overlap(lib, poly1, poly2, bounds):
    def mk(poly):
        arr = np.asarray(poly, dtype=np.float32)
        xs = np.ascontiguousarray(arr[0::2])
        ys = np.ascontiguousarray(arr[1::2])
        p = _RefPolygon(len(xs), xs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                        ys.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return p, xs, ys  # keep arrays alive

    p1, *keep1 = mk(poly1)
    p2, *keep2 = mk(poly2)
    only1 = ctypes.c_float()
    only2 = ctypes.c_float()
    b = _RefBounds(*bounds)
    return lib.compute_polygon_overlap(ctypes.byref(p1), ctypes.byref(p2),
                                       ctypes.byref(only1), ctypes.byref(only2), b)


def _rand_poly(rng, n, scale=100.0, offset=0.0):
    cx, cy = rng.uniform(20, scale, 2) + offset
    angles = np.sort(rng.uniform(0, 2 * np.pi, n))
    r = rng.uniform(5, 40, n)
    xs = cx + r * np.cos(angles)
    ys = cy + r * np.sin(angles)
    out = np.empty(2 * n)
    out[0::2] = xs
    out[1::2] = ys
    return out


BOUNDS_INF = (-3.4e38, 3.4e38, -3.4e38, 3.4e38)


def test_overlap_fuzz_vs_reference(ref_lib):
    rng = np.random.RandomState(0)
    checked = 0
    for trial in range(300):
        n1 = rng.randint(3, 9)
        n2 = rng.randint(3, 9)
        p1 = _rand_poly(rng, n1)
        p2 = _rand_poly(rng, n2, offset=rng.uniform(-30, 30))
        ref = _ref_overlap(ref_lib, p1, p2, BOUNDS_INF)
        ours = vot_overlap(list(p1), list(p2))
        if np.isnan(ref):
            assert np.isnan(ours)
        else:
            assert abs(ours - ref) < 1e-6, (trial, ours, ref)
        checked += 1
    assert checked == 300


def test_overlap_with_image_bounds(ref_lib):
    rng = np.random.RandomState(1)
    for _ in range(100):
        p1 = _rand_poly(rng, 4, scale=300)
        p2 = _rand_poly(rng, 4, scale=300, offset=rng.uniform(-50, 50))
        w, h = 320, 240
        ref = _ref_overlap(ref_lib, p1, p2, (0.0, float(h), 0.0, float(w)))
        ours = vot_overlap(list(p1), list(p2), bounds=(w, h))
        assert abs(ours - ref) < 1e-6


def test_rect_expansion_matches_polygon():
    rect = [10.0, 20.0, 30.0, 40.0]
    poly = [10.0, 20.0, 40.0, 20.0, 40.0, 60.0, 10.0, 60.0]
    assert vot_overlap(rect, poly) == pytest.approx(1.0)


def test_identical_polygons_full_overlap():
    poly = [10.2, 20.7, 40.1, 21.3, 39.8, 60.0, 9.9, 59.5]
    assert vot_overlap(poly, poly) == pytest.approx(1.0)


def test_special_region_nan():
    assert np.isnan(vot_overlap([1.0], [10, 20, 30, 40]))


def test_traj():
    a = [[10, 10, 20, 20]] * 3
    b = [[10, 10, 20, 20], [15, 10, 20, 20], [100, 100, 5, 5]]
    ovs = vot_overlap_traj(a, b)
    assert ovs[0] == pytest.approx(1.0)
    assert 0 < ovs[1] < 1
    assert ovs[2] == 0


def test_rasterize_area():
    # unit square [0,10]x[0,10] rasterizes deterministically
    mask = rasterize_polygon([0, 0, 10, 0, 10, 10, 0, 10], 20, 20)
    assert mask.sum() == 11 * 11  # inclusive fill on the protocol grid


def test_float2str():
    assert vot_float2str("%.4f", 1.23456) == "1.2346"
