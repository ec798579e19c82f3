"""Overfit-pipeline test (RUN_SLOW=1): the full prove-it-learns flow from
tools/overfit.py in miniature — tennis frames -> pseudo-gt boxes + GrabCut
masks -> 511-crop dataset -> stage-1 train CLI -> stage-2 refine CLI with
non-strict warm-start -> evaluate -> report.json — with a learning assertion
(the trained checkpoint fits the train set far better than init).

The real-scale run (full width, full schedule, on the TPU chip) is recorded
in experiments/overfit_tennis/; this test pins the plumbing on CPU at width 8.
"""
import importlib.util
import json
import os
import subprocess
import sys
from os.path import exists, join
from pathlib import Path

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("RUN_SLOW"),
    reason="runs GrabCut over the clip + two train CLIs + a tracker compile; "
           "minutes even warm — set RUN_SLOW=1")

REPO = Path(__file__).resolve().parents[1]
TENNIS = "/root/reference/data/tennis"


def _overfit():
    spec = importlib.util.spec_from_file_location(
        "overfit_mod", str(REPO / "tools" / "overfit.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(not exists(TENNIS), reason="tennis clip not present")
def test_overfit_pipeline_end_to_end(tmp_path):
    overfit = _overfit()
    work = str(tmp_path / "work")

    # -- prepare: pseudo-gt + crops + configs
    overfit.prepare(work, TENNIS, log=lambda *_: None)
    crops = sorted(os.listdir(join(work, "crop511", "tennis")))
    assert len(crops) == 2 * overfit.HELD_OUT_START  # jpg + mask per frame
    gt = json.load(open(join(work, "gt.json")))
    assert len(gt["boxes"]) == overfit.N_FRAMES
    train_json = json.load(open(join(work, "train.json")))
    assert len(train_json["tennis"]["00"]) == overfit.HELD_OUT_START

    # shrink to smoke scale: 16 pairs/epoch, width-8 model
    for name in ("config_stage1.json", "config_stage2.json"):
        p = join(work, name)
        cfg = json.load(open(p))
        cfg["train_datasets"]["num"] = 16
        cfg["train_datasets"]["datasets"]["ytb_vos"]["num_use"] = 16
        json.dump(cfg, open(p, "w"))

    # -- both train CLIs (subprocess: the real user surface). The conftest
    # env exposes 8 virtual CPU devices, so this also exercises the dp mesh:
    # batch 8 = 1 sample/shard.
    env = dict(os.environ)
    s1, s2 = overfit.run_training(work, epochs1=1, epochs2=1, batch=8,
                                  platform="cpu", num_devices=None, width=8,
                                  log=lambda *_: None)
    assert exists(s1) and exists(s2)

    # -- evaluate via the CLI
    subprocess.run([sys.executable, str(REPO / "tools" / "overfit.py"),
                    "--evaluate", "--work-dir", work, "--width", "8",
                    "--epochs2", "1", "--platform", "cpu"],
                   check=True, env=env)
    report = json.load(open(join(work, "report.json")))

    fit = report["train_fit"]
    for split in ("init", "trained"):
        assert all(v == v for v in fit[split].values())  # finite
    # even a width-8 model in 4 steps must fit the train distribution far
    # better than random init (bias toward background alone gives >2x)
    assert fit["trained"]["total_loss"] < fit["init"]["total_loss"] / 2
    assert fit["trained"]["mask_loss"] < fit["init"]["mask_loss"] / 2

    held = report["held_out_tracking"]
    for split in ("init", "trained"):
        assert 0.0 <= held[split]["mean_iou"] <= 1.0
        assert len(held[split]["per_frame_iou"]) == \
            overfit.N_FRAMES - gt["held_out_start"] - 1


@pytest.mark.skipif(not exists(TENNIS), reason="tennis clip not present")
def test_overfit_siamrpn_pipeline_end_to_end(tmp_path):
    """The box-only trainer variant (--task siamrpn): prepare -> single-stage
    train CLI -> evaluate; losses must drop and the box tracker must run on
    the held-out tail (mask branch absent end to end)."""
    overfit = _overfit()
    work = str(tmp_path / "work")
    overfit.prepare(work, TENNIS, log=lambda *_: None)
    p = join(work, "config_rpn.json")
    cfg = json.load(open(p))
    assert cfg["network"]["arch"] == "SiamRPN"
    assert cfg["loss"]["weight"][2] == 0.0
    cfg["train_datasets"]["num"] = 16
    cfg["train_datasets"]["datasets"]["ytb_vos"]["num_use"] = 16
    json.dump(cfg, open(p, "w"))

    ck = overfit.run_training_rpn(work, epochs=2, batch=8, platform="cpu",
                                  num_devices=None, width=8,
                                  log=lambda *_: None)
    assert exists(ck)

    subprocess.run([sys.executable, str(REPO / "tools" / "overfit.py"),
                    "--evaluate", "--task", "siamrpn", "--epochs-rpn", "2",
                    "--work-dir", work, "--width", "8", "--platform", "cpu"],
                   check=True, env=dict(os.environ))
    report = json.load(open(join(work, "report_rpn.json")))
    assert report["task"] == "siamrpn"
    fit = report["train_fit"]
    for split in ("init", "trained"):
        assert "mask_loss" not in fit[split]          # box-only loss path
        assert all(v == v for v in fit[split].values())
    assert fit["trained"]["total_loss"] < fit["init"]["total_loss"]
    held = report["held_out_tracking"]
    gt = json.load(open(join(work, "gt.json")))
    for split in ("init", "trained"):
        assert 0.0 <= held[split]["mean_iou"] <= 1.0
        assert len(held[split]["per_frame_iou"]) == \
            overfit.N_FRAMES - gt["held_out_start"] - 1


@pytest.mark.skipif(not exists(TENNIS), reason="tennis clip not present")
def test_overfit_multi_pipeline_end_to_end(tmp_path):
    """The two-video / two-sub-dataset variant (--task multi): prepare_multi
    builds the mirrored+inverted second clip and a two-SubDataset config with
    the reference's neg/gray sampling probabilities -> single-stage train CLI
    (cross-dataset negatives + gray aug actually drawn) -> evaluate scores
    BOTH clips' held-out tails from the one checkpoint."""
    overfit = _overfit()
    work = str(tmp_path / "work")
    overfit.prepare_multi(work, TENNIS, log=lambda *_: None)

    # second clip on disk: full frames for tracking eval + train-split crops
    assert len(os.listdir(join(work, "frames_inv"))) == overfit.N_FRAMES
    crops = os.listdir(join(work, "crop511_inv", "tennis_inv"))
    assert len(crops) == 2 * overfit.HELD_OUT_START
    gt = json.load(open(join(work, "gt.json")))
    gt_inv = json.load(open(join(work, "gt_inv.json")))
    # mirrored gt: x-extent flips, y-extent unchanged, width preserved
    b, bi = gt["boxes"][10], gt_inv["boxes"][10]
    assert bi[1] == b[1] and bi[3] == b[3]
    assert abs((bi[2] - bi[0]) - (b[2] - b[0])) < 1e-9

    p = join(work, "config_multi.json")
    cfg = json.load(open(p))
    td = cfg["train_datasets"]
    assert set(td["datasets"]) == {"ytb_vos", "coco"}
    assert td["augmentation"]["neg"] == 0.2
    td["num"] = 16
    for d in td["datasets"].values():
        d["num_use"] = 8
    json.dump(cfg, open(p, "w"))

    ck = overfit.run_training_multi(work, epochs=1, batch=8, platform="cpu",
                                    num_devices=None, width=8,
                                    log=lambda *_: None)
    assert exists(ck)

    subprocess.run([sys.executable, str(REPO / "tools" / "overfit.py"),
                    "--evaluate", "--task", "multi", "--epochs-multi", "1",
                    "--work-dir", work, "--width", "8", "--platform", "cpu"],
                   check=True, env=dict(os.environ))
    report = json.load(open(join(work, "report_multi.json")))
    assert report["task"] == "multi"
    fit = report["train_fit"]
    for split in ("init", "trained"):
        assert all(v == v for v in fit[split].values())
    assert fit["trained"]["total_loss"] < fit["init"]["total_loss"]
    held = report["held_out_tracking"]
    assert set(held) == {"tennis", "tennis_inv"}
    for clip in held:
        for split in ("init", "trained"):
            assert 0.0 <= held[clip][split]["mean_iou"] <= 1.0
            assert len(held[clip][split]["per_frame_iou"]) == \
                overfit.N_FRAMES - gt["held_out_start"] - 1


def test_keyframe_interpolation():
    overfit = _overfit()
    boxes = overfit.interpolate_boxes()
    assert boxes.shape == (overfit.N_FRAMES, 4)
    # keyframes reproduced exactly; all boxes inside the 854x480 frame
    for f, kb in overfit.KEYFRAME_BOXES.items():
        assert tuple(boxes[f]) == tuple(float(v) for v in kb)
    assert (boxes[:, 0] >= 0).all() and (boxes[:, 2] <= 854).all()
    assert (boxes[:, 1] >= 0).all() and (boxes[:, 3] <= 480).all()
    assert (boxes[:, 2] > boxes[:, 0]).all() and (boxes[:, 3] > boxes[:, 1]).all()
