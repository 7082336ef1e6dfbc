"""Poly LR schedule parity with the reference formula (utils.py:27-58)."""

import numpy as np
import pytest

from rtda_semanticsegmentation_tpu.train.schedule import poly_lr_schedule


def test_poly_schedule_matches_reference_formula():
    base, max_iter, power = 2.5e-4, 1000, 0.9
    sched = poly_lr_schedule(base, max_iter, power)
    for it in [0, 1, 100, 500, 999]:
        want = base * (1 - it / max_iter) ** power
        assert float(sched(it)) == pytest.approx(want, rel=1e-4)  # f32 pow


def test_poly_schedule_zero_at_and_past_max_iter():
    sched = poly_lr_schedule(1e-3, 100, 0.9)
    assert float(sched(100)) == 0.0
    assert float(sched(150)) == 0.0  # clipped, no NaN
    assert np.isfinite(float(sched(150)))


def test_poly_schedule_rejects_bad_max_iter():
    with pytest.raises(ValueError):
        poly_lr_schedule(1e-3, 0, 0.9)
