"""The checked-in overfit-experiment artifact records that training LEARNS.

tools/overfit.py (the offline analogue of the reference's two-stage recipe,
`run.sh` -> tools/train_siammask.py -> tools/train_siammask_refine.py) was run
end-to-end on the real TPU chip; its report is committed at
experiments/overfit_tennis/report.json. This test pins the artifact's claims
so a regression that silently weakens them (or an accidental overwrite with a
failed run) turns the suite red:

  (a) train fit: the trained checkpoint's losses are far below init's and
      train-batch mask IoU@.5 is high;
  (b) held-out tracking: the trained checkpoint tracks frames it never saw
      better than its init.

The artifact is the proof (produced on hardware); this test is the record.
"""
import json
from os.path import dirname, exists, join, realpath

import pytest

ARTIFACT_DIR = join(dirname(dirname(realpath(__file__))),
                    "experiments", "overfit_tennis")
REPORT = join(ARTIFACT_DIR, "report.json")
REPORT_RPN = join(ARTIFACT_DIR, "report_rpn.json")
REPORT_MULTI = join(ARTIFACT_DIR, "report_multi.json")


@pytest.fixture(scope="module")
def report():
    if not exists(REPORT):
        pytest.skip("overfit artifact not produced yet (see tools/overfit.py)")
    with open(REPORT) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def report_rpn():
    if not exists(REPORT_RPN):
        pytest.skip("siamrpn overfit artifact not produced yet "
                    "(tools/overfit.py --task siamrpn)")
    with open(REPORT_RPN) as f:
        return json.load(f)


def test_train_fit_losses_collapse(report):
    init = report["train_fit"]["init"]
    trained = report["train_fit"]["trained"]
    # mask loss is the stage-2 objective (loss weight (0,0,36)) — >10x fall
    assert trained["mask_loss"] < init["mask_loss"] / 10
    assert trained["total_loss"] < init["total_loss"] / 10


def test_train_fit_mask_iou(report):
    assert report["train_fit"]["init"]["iou_at_5"] < 0.2
    assert report["train_fit"]["trained"]["iou_at_5"] > 0.85
    assert report["train_fit"]["trained"]["iou_mean"] > 0.6


def test_held_out_tracking_improves(report):
    init = report["held_out_tracking"]["init"]
    trained = report["held_out_tracking"]["trained"]
    # frames >= held_out_start were never trained on (tools/overfit.py)
    assert report["held_out_start"] == 56
    assert trained["mean_iou"] > init["mean_iou"] + 0.2
    assert trained["mean_iou"] > 0.5
    assert trained["lost"] <= init["lost"]


# --- SiamRPN (box-only) learning proof: the tools/train_siamrpn.py analogue
# (reference models/siamrpn.py:56-65 — cls+loc losses only, no mask branch).
# Single-stage schedule across the 50% unfreeze boundary, scored on held-out
# box IoU with mask/refine disabled.

def test_rpn_train_fit_losses_collapse(report_rpn):
    assert report_rpn["task"] == "siamrpn"
    init = report_rpn["train_fit"]["init"]
    trained = report_rpn["train_fit"]["trained"]
    assert trained["cls_loss"] < init["cls_loss"] / 5
    assert trained["loc_loss"] < init["loc_loss"] / 2
    assert trained["total_loss"] < init["total_loss"] / 4


def test_rpn_held_out_tracking_improves(report_rpn):
    init = report_rpn["held_out_tracking"]["init"]
    trained = report_rpn["held_out_tracking"]["trained"]
    assert report_rpn["held_out_start"] == 56
    assert trained["mean_iou"] > init["mean_iou"] + 0.2
    assert trained["mean_iou"] > 0.5
    assert trained["lost"] <= init["lost"]


# --- Multi-video / multi-dataset proof: two clips registered as two
# SubDatasets, trained as ONE stage-1 run with the reference's sampling
# probabilities (neg 0.2 incl. cross-dataset negatives, gray 0.25) — the
# pick-mixing + negative-pair machinery (reference
# datasets/siam_mask_dataset.py:494-509,520-533) demonstrated to learn, not
# just unit-tested. One checkpoint must track BOTH clips' held-out tails.

@pytest.fixture(scope="module")
def report_multi():
    if not exists(REPORT_MULTI):
        pytest.skip("multi-video overfit artifact not produced yet "
                    "(tools/overfit.py --task multi)")
    with open(REPORT_MULTI) as f:
        return json.load(f)


def test_multi_train_fit_losses_collapse(report_multi):
    assert report_multi["task"] == "multi"
    init = report_multi["train_fit"]["init"]
    trained = report_multi["train_fit"]["trained"]
    # the scored batch includes negative pairs (cls-only supervision), so
    # the collapse bars sit between the pure-positive mask proof's (>10x)
    # and the box proof's (>4x)
    assert trained["total_loss"] < init["total_loss"] / 4
    assert trained["cls_loss"] < init["cls_loss"] / 2
    assert trained["mask_loss"] < init["mask_loss"] / 4


def test_multi_held_out_tracking_improves_both_clips(report_multi):
    assert report_multi["held_out_start"] == 56
    for clip in ("tennis", "tennis_inv"):
        init = report_multi["held_out_tracking"][clip]["init"]
        trained = report_multi["held_out_tracking"][clip]["trained"]
        assert trained["mean_iou"] > init["mean_iou"] + 0.2, clip
        assert trained["mean_iou"] > 0.5, clip
        assert trained["lost"] <= init["lost"], clip
