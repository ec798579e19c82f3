"""Tuning-grid cooperative file-claim protocol tests (tools/tune.py run_grid —
the reference's tune_vot.py Occ-claim / finish.flag semantics)."""
import importlib.util
from pathlib import Path


def _run_grid():
    spec = importlib.util.spec_from_file_location(
        "tune_mod", str(Path(__file__).resolve().parents[1] / "tools" / "tune.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.run_grid


def test_two_processes_share_one_grid(tmp_path):
    run_grid = _run_grid()
    grid = list(range(10))
    tag = str
    scored = []

    def score(cell):
        scored.append(cell)
        return cell * 2

    # "process" A scores the even cells only (simulated by pre-claiming odds)
    for c in grid[1::2]:
        (tmp_path / f"{c}.txt").write_text("Occ")
    done_a = run_grid(grid, str(tmp_path), tag, score, log=lambda *_: None)
    assert done_a == 5 and scored == grid[0::2]

    # a second pass over the same grid finds everything claimed
    scored.clear()
    done_b = run_grid(grid, str(tmp_path), tag, score, log=lambda *_: None)
    assert done_b == 0 and scored == []

    # results persisted with scores, claims still 'Occ'
    assert (tmp_path / "0.txt").read_text().strip() == "0 score 0"
    assert (tmp_path / "1.txt").read_text() == "Occ"


def test_finish_flag_poison_pill(tmp_path):
    run_grid = _run_grid()
    (tmp_path / "finish.flag").write_text("")
    done = run_grid([1, 2, 3], str(tmp_path), str, lambda c: c,
                    log=lambda *_: None)
    assert done == 0
