"""Meters and logging utilities."""
import logging

import numpy as np

from siammask_tpu.utils.log import init_log, log_once, print_speed
from siammask_tpu.utils.meters import AverageMeter, IouMeter


def test_average_meter():
    m = AverageMeter()
    m.update(batch=1, loss=2.0, acc=0.5)
    m.update(batch=3, loss=1.0, acc=1.0)
    assert m.loss.val == 1.0
    assert m.loss.avg == (2.0 + 3.0) / 4
    assert m.acc.avg == (0.5 + 3.0) / 4
    assert "loss" in repr(m)


def test_iou_meter():
    m = IouMeter(thrs=[0.5], sz=10)
    pred = np.zeros((8, 8))
    pred[:4] = 1.0
    target = np.zeros((8, 8))
    target[:4] = 1
    m.add(pred, target)
    assert m.value("mean")[0] == 1.0
    target2 = np.zeros((8, 8))
    target2[:2] = 1
    m.add(pred, target2)
    assert abs(m.value("mean")[0] - 0.75) < 1e-6
    assert m.value("median")[0] == 0.75
    assert m.value("@0.6")[0] == 0.5


def test_log_helpers(capsys):
    logger = init_log("test_logger_x")
    logger.info("hello")
    print_speed(10, 0.5, 100, "test_logger_x")
    for _ in range(3):
        log_once("only once", "test_logger_x")
    out = capsys.readouterr().out
    assert out.count("only once") == 1
    assert "Progress: 10 / 100" in out
