"""Confusion matrix / IoU kernels vs the reference's numpy math."""

import jax.numpy as jnp
import numpy as np
import pytest

from rtda_semanticsegmentation_tpu.ops.metrics import (
    confusion_matrix,
    mean_iou,
    per_class_iou,
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
