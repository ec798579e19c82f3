"""tools/curves.py parses trainer logs into per-epoch mean rows."""
import importlib.util
import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _curves():
    spec = importlib.util.spec_from_file_location(
        "curves_mod", str(REPO / "tools" / "curves.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_parse_means_and_epoch_split(tmp_path):
    log = tmp_path / "train.log"
    log.write_text(
        "2026-01-01 INFO epoch 0 step 8 lr 0.00500 cls_loss=0.4000 "
        "mask_loss=0.2000 total_loss=10.0000 (1.0s/it)\n"
        "junk line\n"
        "2026-01-01 INFO epoch 0 step 16 lr 0.00500 cls_loss=0.2000 "
        "mask_loss=0.4000 total_loss=6.0000 (0.1s/it)\n"
        "2026-01-01 INFO epoch 1 step 24 lr 0.00100 cls_loss=0.1000 "
        "mask_loss=0.1000 total_loss=2.0000 (0.1s/it)\n")
    rows = _curves().parse(str(log))
    assert [r["epoch"] for r in rows] == [0, 1]
    assert rows[0]["steps_logged"] == 2
    assert rows[0]["cls_loss"] == 0.3
    assert rows[0]["mask_loss"] == 0.3
    assert rows[1]["lr"] == 0.001


def test_committed_artifact_curves_parse():
    rows = _curves().parse(str(
        REPO / "experiments/overfit_tennis/logs/stage2_e24.log"))
    assert len(rows) == 24
    assert rows[-1]["iou_at_5"] > 0.9
    committed = json.loads(
        (REPO / "experiments/overfit_tennis/logs/stage2_e24_curve.json")
        .read_text())
    assert rows == committed
