"""Differential tests: our C++ RLE codec vs the reference's vendored COCO maskApi
(compiled as a test oracle via ctypes)."""
import ctypes
import subprocess

import numpy as np
import pytest

from siammask_tpu.data import rle


class _RefRLE(ctypes.Structure):
    _fields_ = [("h", ctypes.c_ulong), ("w", ctypes.c_ulong),
                ("m", ctypes.c_ulong), ("cnts", ctypes.POINTER(ctypes.c_uint))]


@pytest.fixture(scope="module")
def ref(tmp_path_factory, reference_path):
    src = reference_path / "data" / "coco" / "pycocotools" / "common"
    out = tmp_path_factory.mktemp("masklib") / "libref_mask.so"
    subprocess.run(["gcc", "-O2", "-shared", "-fPIC", str(src / "maskApi.c"),
                    "-I", str(src), "-o", str(out), "-lm"],
                   check=True, capture_output=True)
    lib = ctypes.CDLL(str(out))
    lib.rleFrPoly.argtypes = [ctypes.POINTER(_RefRLE),
                              ctypes.POINTER(ctypes.c_double),
                              ctypes.c_ulong, ctypes.c_ulong, ctypes.c_ulong]
    lib.rleEncode.argtypes = [ctypes.POINTER(_RefRLE),
                              ctypes.POINTER(ctypes.c_ubyte),
                              ctypes.c_ulong, ctypes.c_ulong, ctypes.c_ulong]
    lib.rleToString.restype = ctypes.c_char_p
    lib.rleToString.argtypes = [ctypes.POINTER(_RefRLE)]
    return lib


def _ref_counts(r: _RefRLE):
    return np.array([r.cnts[i] for i in range(r.m)], dtype=np.uint32)


def test_encode_decode_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(10):
        mask = (rng.rand(37, 53) > 0.6).astype(np.uint8)
        enc = rle.encode(mask)
        dec = rle.decode(enc)
        np.testing.assert_array_equal(dec, mask)


def test_encode_matches_reference(ref):
    rng = np.random.RandomState(1)
    mask = (rng.rand(23, 31) > 0.5).astype(np.uint8)
    flat = np.asfortranarray(mask).ravel(order="F").astype(np.uint8)
    flat = np.ascontiguousarray(flat)
    r = _RefRLE()
    ref.rleEncode(ctypes.byref(r),
                  flat.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
                  23, 31, 1)
    theirs = _ref_counts(r)
    ours = rle.string_to_counts(rle.encode(mask)["counts"])
    np.testing.assert_array_equal(ours, theirs)
    # string codec parity too
    assert rle.encode(mask)["counts"] == ref.rleToString(ctypes.byref(r)).decode()


def test_frpoly_matches_reference(ref):
    rng = np.random.RandomState(2)
    for _ in range(50):
        h, w = rng.randint(20, 80), rng.randint(20, 80)
        n = rng.randint(3, 9)
        cx, cy = rng.uniform(5, w - 5), rng.uniform(5, h - 5)
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        rad = rng.uniform(2, min(h, w) / 2, n)
        xy = np.empty(2 * n)
        xy[0::2] = cx + rad * np.cos(ang)
        xy[1::2] = cy + rad * np.sin(ang)

        r = _RefRLE()
        xyc = np.ascontiguousarray(xy)
        ref.rleFrPoly(ctypes.byref(r),
                      xyc.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                      n, h, w)
        theirs = _ref_counts(r)
        ours = rle.fr_poly(xy, h, w)
        np.testing.assert_array_equal(ours, theirs)


def test_merge_area_bbox():
    m1 = np.zeros((20, 20), np.uint8)
    m1[2:8, 3:9] = 1
    m2 = np.zeros((20, 20), np.uint8)
    m2[5:12, 6:15] = 1
    c1 = rle.string_to_counts(rle.encode(m1)["counts"])
    c2 = rle.string_to_counts(rle.encode(m2)["counts"])
    union = rle.merge([c1, c2], 20, 20)
    np.testing.assert_array_equal(
        rle.decode({"size": [20, 20], "counts": union}), (m1 | m2))
    inter = rle.merge([c1, c2], 20, 20, intersect=True)
    np.testing.assert_array_equal(
        rle.decode({"size": [20, 20], "counts": inter}), (m1 & m2))
    assert rle.area(c1) == m1.sum()
    x, y, w, h = rle.to_bbox(c1, 20)
    assert (x, y, w, h) == (3, 2, 6, 6)


def test_ann_to_mask_polygon():
    # a 10x10 axis-aligned square polygon
    ann = {"segmentation": [[2, 2, 12, 2, 12, 12, 2, 12]]}
    mask = rle.ann_to_mask(ann, 20, 20)
    assert mask.shape == (20, 20)
    assert 80 <= mask.sum() <= 121  # COCO boundary semantics, ~10x10
