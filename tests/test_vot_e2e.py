"""End-to-end VOT protocol test on a synthetic mini dataset: tracker (random
weights, small frames) -> reset-protocol driver -> result files -> VOT json
metadata builder -> AR/EAO evaluation. Verifies the full benchmark plumbing."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import cv2

from siammask_tpu.config import TrackerConfig
from siammask_tpu.data.gen_json import create_vot_json
from siammask_tpu.eval.benchmarks import AccuracyRobustnessBenchmark, EAOBenchmark
from siammask_tpu.eval.datasets import VOTDataset, load_dataset
from siammask_tpu.models.siammask import SiamMaskSharp
from siammask_tpu.tracker.runtime import TrackerRuntime
from siammask_tpu.tracker.vot import track_vot

HP = {"instance_size": 255, "out_size": 127, "base_size": 8, "seg_thr": 0.3,
      "penalty_k": 0.04, "window_influence": 0.4, "lr": 1.0}


def _make_vot_dataset(root, n_videos=2, n_frames=6, h=120, w=160):
    videos = []
    rng = np.random.RandomState(0)
    for v in range(n_videos):
        name = f"vid{v}"
        vdir = root / name
        vdir.mkdir(parents=True)
        gts = []
        for f in range(n_frames):
            im = rng.randint(0, 60, (h, w, 3), dtype=np.uint8)
            x0, y0 = 40 + 3 * f + 10 * v, 30 + 2 * f
            im[y0:y0 + 40, x0:x0 + 30] = 220
            cv2.imwrite(str(vdir / f"{f + 1:08d}.jpg"), im)
            gts.append([x0, y0, x0 + 30, y0, x0 + 30, y0 + 40, x0, y0 + 40])
        np.savetxt(vdir / "groundtruth.txt", np.array(gts, dtype=float),
                   delimiter=",", fmt="%.4f")
        for tag in ("camera_motion", "illum_change", "motion_change",
                    "size_change", "occlusion"):
            (vdir / f"{tag}.tag").write_text("\n".join("0" * n_frames) + "\n")
        videos.append(name)
    (root / "list.txt").write_text("\n".join(videos) + "\n")


@pytest.mark.slow_ok  # ~2-4 min cold compile of the small-frame track step
def test_vot_end_to_end(tmp_path):
    data_dir = tmp_path / "data"
    vot_root = data_dir / "VOT2018"
    _make_vot_dataset(vot_root)

    # dataset loader (list.txt / groundtruth.txt layout)
    dataset = load_dataset("VOT2018", str(data_dir))
    assert set(dataset) == {"vid0", "vid1"}
    assert dataset["vid0"]["gt"].shape == (6, 8)

    model = SiamMaskSharp()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 127, 127, 3)),
                           jnp.zeros((1, 255, 255, 3)))
    p = TrackerConfig().update(HP)
    runtime = TrackerRuntime(model, variables, p, mask=True, refine=True)

    result_dir = str(tmp_path / "test")
    for video in dataset.values():
        lost, fps = track_vot(runtime, video, dataset="VOT2018",
                              mask_enable=True, result_dir=result_dir,
                              tracker_name="rand", log=lambda *_: None)
        assert lost >= 0

    # result files in the exact VOT layout
    f0 = tmp_path / "test" / "VOT2018" / "rand" / "baseline" / "vid0" / "vid0_001.txt"
    lines = f0.read_text().strip().split("\n")
    assert lines[0] == "1"
    assert len(lines) == 6
    for line in lines[1:]:
        # 1 = re-init, 2 = lost, 0 = skipped (reset protocol), else polygon
        assert line in ("0", "1", "2") or len(line.split(",")) == 8

    # metadata builder -> eval toolkit
    meta = create_vot_json(str(vot_root), "VOT2018",
                           out_file=str(data_dir / "VOT2018.json"))
    assert meta["vid0"]["width"] == 160
    ds = VOTDataset("VOT2018", str(data_dir))
    ds.set_tracker(str(tmp_path / "test" / "VOT2018"), ["rand"])

    ar = AccuracyRobustnessBenchmark(ds).eval("rand")
    summary = AccuracyRobustnessBenchmark.summarize(ar)
    assert "rand" in summary and np.isfinite(summary["rand"]["robustness"])
    eao_bench = EAOBenchmark(ds)
    # the VOT2018 curve interval (frames 100..356) is empty on 6-frame synthetic
    # videos — shrink it to the sequence length for the test
    eao_bench.low, eao_bench.high = 1, 5
    eao = eao_bench.eval("rand")
    assert 0 <= eao["rand"]["all"] <= 1


@pytest.mark.slow_ok  # reuses test_vot_end_to_end's compile-cache entries
def test_tune_cell_scored_by_eao(tmp_path):
    """A VOT tune grid cell writes full trajectory result files and is scored
    by EAO (tools/tune.py score_vot_cell), not by raw lost count — matching
    the reference's tune_vot.py:163-166 write-then-EAO-rank flow."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "tune_mod", str(Path(__file__).resolve().parents[1] / "tools" / "tune.py"))
    tune = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(tune)

    data_dir = tmp_path / "data"
    vot_root = data_dir / "VOT2018"
    _make_vot_dataset(vot_root)
    dataset = load_dataset("VOT2018", str(data_dir))
    create_vot_json(str(vot_root), "VOT2018",
                    out_file=str(data_dir / "VOT2018.json"))
    vot_ds = VOTDataset("VOT2018", str(data_dir))

    model = SiamMaskSharp()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 127, 127, 3)),
                           jnp.zeros((1, 255, 255, 3)))
    p = TrackerConfig().update(HP)
    runtime = TrackerRuntime(model, variables, p, mask=True, refine=True)

    out_dir = tmp_path / "tune"
    tag = "pk0.04_wi0.4_lr1.0_in255"
    done = tune.run_grid(
        [tag], str(out_dir), lambda c: c,
        lambda c: tune.score_vot_cell(runtime, dataset, vot_ds, c,
                                      str(out_dir), "VOT2018",
                                      eao_interval=(1, 5),
                                      log=lambda *_: None),
        log=lambda *_: None)
    assert done == 1

    # the cell file records an EAO score in [0, 1]
    text = (out_dir / f"{tag}.txt").read_text().strip()
    score = float(text.split(" score ")[1])
    assert 0.0 <= score <= 1.0

    # and the per-video trajectory files the score came from exist on disk
    for vid in ("vid0", "vid1"):
        traj = out_dir / "results" / "VOT2018" / tag / "baseline" / vid / f"{vid}_001.txt"
        assert traj.exists()
        assert traj.read_text().strip().split("\n")[0] == "1"

    # the recorded score IS the EAO the in-tree benchmark computes
    vot_ds.set_tracker(str(out_dir / "results" / "VOT2018"), [tag])
    bench = EAOBenchmark(vot_ds)
    bench.low, bench.high = 1, 5
    assert score == pytest.approx(bench.eval(tag)[tag]["all"])
