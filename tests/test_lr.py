"""LR schedule parity vs the reference lr_helper (torch scheduler oracle)."""
import numpy as np
import pytest
import torch

from siammask_tpu.train.lr import build_lr_spaces


@pytest.fixture(scope="module")
def ref_builder(reference_on_path):
    from utils import lr_helper  # noqa

    def build(cfg, epochs=50):
        opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=0.01)
        return lr_helper.build_lr_scheduler(opt, dict(cfg), epochs=epochs).lr_spaces

    return build


@pytest.mark.parametrize("cfg,epochs", [
    ({"type": "log", "start_lr": 0.03, "end_lr": 5e-4}, 50),
    ({"type": "log", "start_lr": 0.005, "end_lr": 0.0025}, 20),
    ({"type": "step", "start_lr": 0.01, "step": 10, "mult": 0.1}, 50),
    ({"type": "multi-step", "start_lr": 0.01, "mult": 0.1, "steps": [10, 15, 20]}, 50),
    ({"type": "linear", "start_lr": 0.01, "end_lr": 0.005}, 50),
    ({"type": "cos", "start_lr": 0.01, "end_lr": 0.0005}, 50),
])
def test_schedule_parity(ref_builder, cfg, epochs):
    theirs = ref_builder(cfg, epochs)
    ours = build_lr_spaces(cfg, epochs)
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_warmup_parity(ref_builder):
    cfg = {"type": "log", "start_lr": 0.005, "end_lr": 0.0025,
           "warmup": {"start_lr": 0.001, "end_lr": 0.005, "type": "step",
                      "step": 1, "epoch": 5}}
    theirs = ref_builder(dict(cfg, warmup=dict(cfg["warmup"])), 20)
    ours = build_lr_spaces(cfg, 20)
    assert len(ours) == 20
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_warmup_truncates_for_short_runs():
    """--epochs below the config's warmup length (smoke runs) must truncate
    the warmup instead of crashing on a negative-length post-warmup space."""
    from siammask_tpu.train.lr import build_lr_spaces
    cfg = {"type": "log", "start_lr": 0.005, "end_lr": 0.0005,
           "warmup": {"type": "step", "start_lr": 0.001, "step": 1,
                      "epoch": 5, "mult": 1.4}}
    sched = build_lr_spaces(cfg, epochs=1)
    assert len(sched) == 1 and sched[0] > 0
    full = build_lr_spaces(cfg, epochs=20)
    assert len(full) == 20
