"""Confusion matrix / IoU kernels vs the reference's numpy math."""

import jax.numpy as jnp
import numpy as np
import pytest

from rtda_semanticsegmentation_tpu.ops.metrics import (
    confusion_matrix,
    mean_iou,
    per_class_iou,
    per_class_iou_np,
)
from oracles import fast_hist_oracle, per_class_iou_oracle


@pytest.mark.parametrize("seed", range(3))
def test_confusion_matrix_matches_fast_hist(seed):
    rng = np.random.default_rng(seed)
    n = 19
    labels = rng.integers(0, n, size=4096).astype(np.int32)
    labels[rng.random(4096) < 0.15] = 255  # ignore pixels
    preds = rng.integers(0, n, size=4096).astype(np.int32)
    got = np.asarray(confusion_matrix(jnp.array(labels), jnp.array(preds), n))
    want = fast_hist_oracle(labels, preds, n)
    np.testing.assert_array_equal(got, want)


def test_per_class_iou_matches_oracle():
    rng = np.random.default_rng(0)
    hist = rng.integers(0, 100, size=(19, 19)).astype(np.int64)
    hist[5] = 0
    hist[:, 5] = 0  # class with no pixels at all -> IoU 0
    got = np.asarray(per_class_iou(jnp.array(hist)))
    want = per_class_iou_oracle(hist)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert got[5] == 0.0


def test_mean_iou_perfect_prediction():
    labels = np.random.default_rng(1).integers(0, 19, size=10000).astype(np.int32)
    hist = confusion_matrix(jnp.array(labels), jnp.array(labels), 19)
    # all 19 classes present with only diagonal entries -> IoU ~= 1 each
    assert float(mean_iou(hist)) == pytest.approx(1.0, abs=1e-3)


def test_confusion_matrix_accumulates_across_batches():
    rng = np.random.default_rng(2)
    labels = rng.integers(0, 19, size=(4, 64)).astype(np.int32)
    preds = rng.integers(0, 19, size=(4, 64)).astype(np.int32)
    total = jnp.zeros((19, 19), jnp.int32)
    for i in range(4):
        total = total + confusion_matrix(jnp.array(labels[i]), jnp.array(preds[i]), 19)
    want = fast_hist_oracle(labels.ravel(), preds.ravel(), 19)
    np.testing.assert_array_equal(np.asarray(total), want)


def test_mean_iou_equals_reference_nanmean():
    """Pins the absent-class semantics: the reference takes np.nanmean over
    per-class IoUs (validation.py:135-136) where an absent class's 0/0 is
    NaN; per_class_iou already maps that class to 0 via its epsilon
    (0/eps = 0), so nanmean over the *raw* ratios equals the plain mean we
    take — an equivalence a future epsilon change must not break."""
    rng = np.random.default_rng(3)
    hist = rng.integers(0, 1000, size=(19, 19)).astype(np.float64)
    for absent in (4, 11):  # classes absent from labels AND predictions
        hist[absent] = 0.0
        hist[:, absent] = 0.0
    tp = np.diag(hist)
    with np.errstate(invalid="ignore"):
        raw = tp / (hist.sum(1) + hist.sum(0) - tp)  # reference: NaN when absent
    raw[np.isnan(raw)] = 0.0  # utils.py:92-116 nan->0 before nanmean
    want = np.nanmean(raw)
    got = float(mean_iou(jnp.asarray(hist)))
    assert got == pytest.approx(want, rel=1e-5)
    np_got = per_class_iou_np(hist)
    np.testing.assert_allclose(np_got, raw, rtol=1e-5, atol=1e-8)


def test_per_class_iou_np_float64_exact_past_2pow24():
    """Host IoU reduction must be float64: int64 counts past 2^24 would round
    in float32 (~6e-8 relative error the reference's numpy path never has)."""
    tp0, fp0 = (1 << 30) + 1, (1 << 24) + 3
    hist = np.zeros((2, 2), np.int64)
    hist[0, 0], hist[0, 1], hist[1, 1] = tp0, fp0, 7
    want0 = tp0 / (tp0 + fp0 + 1e-5)
    got = per_class_iou_np(hist)
    assert got[0] == pytest.approx(want0, rel=1e-14)
    # the old float32 device path loses the +1/+3 (2^30+1 rounds to 2^30)
    old = np.asarray(per_class_iou(jnp.asarray(hist.astype(np.float32))))
    assert old[0] != got[0]


def test_evaluate_hist_accumulation_past_int32():
    """evaluate() must stay exact when the summed confusion matrix exceeds
    int32 (GTA5-sized eval sets put a dominant class's TP cell past 2^31):
    the device int32 hist flushes into a host int64 accumulator."""
    from rtda_semanticsegmentation_tpu.train.evaluate import evaluate

    cell = 1 << 28

    def fake_step(variables, images, labels, valid):
        return (
            jnp.full((2, 2), cell, jnp.int32),
            jnp.float32(0.0),
            jnp.float32(1.0),
        )

    # labels with 2^30 logical pixels (broadcast view: no memory) force
    # flush_every == 1, so 16 batches x 2^28 per cell crosses 2^32.
    labels = np.broadcast_to(np.zeros((), np.int32), (1 << 15, 1 << 15))
    batches = [(None, labels, None)] * 16
    out = evaluate(fake_step, None, batches, num_classes=2)
    assert out["hist"].dtype == np.int64
    assert int(out["hist"][0, 0]) == 16 * cell
