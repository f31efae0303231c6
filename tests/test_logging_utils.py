"""utils/logging + utils/rng: AverageMeter math (reference models/loss.py
loss_obj), MetricLogger aggregation, RngStream determinism."""

import numpy as np

from image_captioning_ml_project_tpu.utils.logging import (
    AverageMeter,
    MetricLogger,
)
from image_captioning_ml_project_tpu.utils.rng import RngStream


def test_average_meter_weighted():
    m = AverageMeter()
    m.update(2.0, n=3)
    m.update(5.0, n=1)
    assert m.val == 5.0
    assert m.count == 4
    np.testing.assert_allclose(m.avg, (2.0 * 3 + 5.0) / 4)
    m.reset()
    assert m.avg == 0.0 and m.count == 0


def test_metric_logger_collects_components():
    log = MetricLogger()
    log.update(n=2, ce=1.0, reg=0.5)
    log.update(n=2, ce=3.0, reg=0.5)
    avgs = log.averages()
    np.testing.assert_allclose(avgs["ce"], 2.0)
    np.testing.assert_allclose(avgs["reg"], 0.5)
    assert "ce: 2.0000" in str(log)


def test_rng_stream_deterministic_and_distinct():
    a, b = RngStream(7), RngStream(7)
    k1, k2 = a.next(), a.next()
    assert not np.array_equal(np.asarray(k1), np.asarray(k2))
    # same seed -> same stream
    np.testing.assert_array_equal(np.asarray(b.next()), np.asarray(k1))
    np.testing.assert_array_equal(np.asarray(b.next()), np.asarray(k2))
    ks = RngStream(0).next_n(4)
    assert len(ks) == 4
    flat = {tuple(np.asarray(k).tolist()) for k in ks}
    assert len(flat) == 4  # all distinct
