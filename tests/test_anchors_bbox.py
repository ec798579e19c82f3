"""Golden-value parity for anchors and bbox helpers against the reference's
pure-numpy modules (imported as test oracles — no torch involved)."""
import numpy as np
import pytest

from siammask_tpu.tracker.anchors import (AnchorConfig, Anchors, generate_all_anchors,
                                          generate_anchors, generate_score_map_anchors)
from siammask_tpu.utils import bbox as bb


@pytest.fixture(scope="module")
def ref(reference_on_path):
    from utils import anchors as ref_anchors  # noqa
    from utils import bbox_helper as ref_bbox  # noqa
    return ref_anchors, ref_bbox


def test_per_position_anchors_match(ref):
    ref_anchors, _ = ref
    cfg = {"stride": 8, "ratios": [0.33, 0.5, 1, 2, 3], "scales": [8], "round_dight": 0}
    theirs = ref_anchors.Anchors(cfg).anchors
    ours = generate_anchors(AnchorConfig.from_dict(cfg))
    np.testing.assert_array_equal(ours, theirs)


def test_per_position_anchors_density2(ref):
    ref_anchors, _ = ref
    cfg = {"stride": 16, "anchor_density": 2}
    theirs = ref_anchors.Anchors(cfg).anchors
    ours = generate_anchors(AnchorConfig.from_dict(cfg))
    np.testing.assert_array_equal(ours, theirs)


def test_all_anchors_match(ref):
    ref_anchors, _ = ref
    cfg = {"stride": 8, "ratios": [0.33, 0.5, 1, 2, 3], "scales": [8], "round_dight": 0}
    a = ref_anchors.Anchors(cfg)
    assert a.generate_all_anchors(im_c=255 // 2, size=25)
    ours_corner, ours_center = generate_all_anchors(AnchorConfig.from_dict(cfg),
                                                    im_c=255 // 2, size=25)
    np.testing.assert_allclose(ours_corner, a.all_anchors[0], rtol=0, atol=0)
    np.testing.assert_allclose(ours_center, a.all_anchors[1], rtol=0, atol=0)


def test_score_map_anchors_shape_and_values():
    cfg = AnchorConfig()
    anchor = generate_score_map_anchors(cfg, 25)
    assert anchor.shape == (5 * 25 * 25, 4)
    # row-major: anchor k, then y, then x; centers on stride-8 grid centered at 0
    assert anchor[0, 0] == -(25 // 2) * 8
    assert anchor[0, 1] == -(25 // 2) * 8
    # same anchor at next x position
    assert anchor[1, 0] == anchor[0, 0] + 8
    assert anchor[1, 1] == anchor[0, 1]
    # w/h constant per anchor block
    block = anchor[:625]
    assert np.unique(block[:, 2]).size == 1 and np.unique(block[:, 3]).size == 1
    # anchor sizes from int-truncated sqrt: ratio 0.33 -> ws=int(sqrt(64/0.33))=13
    assert block[0, 2] == 13 * 8 and block[0, 3] == int(13 * 0.33) * 8


def test_anchors_object_caches():
    a = Anchors(AnchorConfig())
    assert a.generate_all_anchors(127, 25)
    assert not a.generate_all_anchors(127, 25)
    assert a.generate_all_anchors(127, 17)


def test_corner_center_roundtrip(ref):
    _, ref_bbox = ref
    rng = np.random.RandomState(0)
    corner = rng.uniform(0, 100, size=(4, 13))
    corner[2:] += 100
    ours = bb.corner2center(corner)
    theirs = ref_bbox.corner2center(corner)
    np.testing.assert_allclose(ours, theirs)
    back = bb.center2corner(ours)
    np.testing.assert_allclose(back, ref_bbox.center2corner(theirs))


def test_axis_aligned_bbox(ref):
    _, ref_bbox = ref
    rng = np.random.RandomState(1)
    for _ in range(20):
        poly = rng.uniform(0, 200, size=8)
        np.testing.assert_allclose(bb.get_axis_aligned_bbox(poly),
                                   ref_bbox.get_axis_aligned_bbox(poly))
    rect = np.array([10.0, 20.0, 30.0, 40.0])
    np.testing.assert_allclose(bb.get_axis_aligned_bbox(rect),
                               ref_bbox.get_axis_aligned_bbox(rect))


def test_aug_apply_forward_inverse(ref):
    _, ref_bbox = ref
    rng = np.random.RandomState(2)
    shape = (480, 640)
    for _ in range(20):
        box = bb.Corner(*sorted(rng.uniform(0, 640, 2)), *sorted(rng.uniform(0, 480, 2)))
        box = bb.Corner(box.x1, box.x2, box.y1, box.y2)  # x1,y1,x2,y2
        box = bb.Corner(min(box.x1, box.y1 + 1), min(box.x2, box.y2 + 1),
                        max(box.x1, box.y1 + 1), max(box.x2, box.y2 + 1))
        param = {"scale": tuple(rng.uniform(0.8, 1.2, 2)),
                 "shift": tuple(rng.uniform(-20, 20, 2))}
        ours, ours_real = bb.aug_apply(box, dict(param), shape)
        ref_box = ref_bbox.Corner(*box)
        theirs, theirs_real = ref_bbox.aug_apply(ref_box, dict(param), shape)
        np.testing.assert_allclose(tuple(ours), tuple(theirs))
        np.testing.assert_allclose(ours_real["scale"], theirs_real["scale"])
        np.testing.assert_allclose(ours_real["shift"], theirs_real["shift"])
        inv = bb.aug_apply(ours, ours_real, shape, inv=True)
        np.testing.assert_allclose(tuple(inv), tuple(box), atol=1e-9)


def test_iou_matches(ref):
    _, ref_bbox = ref
    rng = np.random.RandomState(3)
    a = rng.uniform(0, 50, size=(4, 30))
    a[2:] = a[:2] + rng.uniform(1, 50, size=(2, 30))
    b = rng.uniform(0, 50, size=(4, 30))
    b[2:] = b[:2] + rng.uniform(1, 50, size=(2, 30))
    np.testing.assert_allclose(bb.bbox_iou(a, b), ref_bbox.IoU(a, b))
