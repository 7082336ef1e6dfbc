"""Pallas radix-histogram kernel vs a numpy oracle (interpret mode on CPU).

On TPU this kernel is the forward histogram producer for the binned Lovász
loss; correctness here (counts exact, error sums within bf16 rounding) plus
the loss-level tests in test_losses.py cover the full path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rtda_semanticsegmentation_tpu.ops.pallas_lovasz import lovasz_radix_hist


def oracle(probas, labels, bins, ignore=255):
    C, P = probas.shape
    ref = np.zeros((C, 3, bins), np.float64)
    valid = labels != ignore
    for c in range(C):
        fg = ((labels == c) & valid).astype(np.float64)
        e = np.abs(fg - probas[c])
        b = np.clip((e * bins).astype(int), 0, bins - 1)
        for i in range(P):
            if not valid[i]:
                continue
            ref[c, 0, b[i]] += 1
            ref[c, 1, b[i]] += fg[i]
            ref[c, 2, b[i]] += e[i]
    return ref


@pytest.mark.parametrize("bins,chunk", [(256, 512), (1024, 1024)])
def test_kernel_matches_oracle(bins, chunk):
    rng = np.random.RandomState(0)
    C, P = 5, 2500  # P not a multiple of chunk -> exercises padding
    probas = rng.rand(C, P).astype(np.float32)
    labels = rng.randint(0, C, P).astype(np.int32)
    labels[rng.rand(P) < 0.15] = 255

    hist = np.asarray(
        lovasz_radix_hist(
            jnp.asarray(probas), jnp.asarray(labels),
            bins=bins, chunk=chunk, interpret=True,
        )
    )
    ref = oracle(probas, labels, bins)
    np.testing.assert_array_equal(hist[:, 0], ref[:, 0])  # counts exact
    np.testing.assert_array_equal(hist[:, 1], ref[:, 1])  # fg exact
    # error sums accumulate bf16-rounded elements
    np.testing.assert_allclose(hist[:, 2], ref[:, 2], rtol=5e-3, atol=5e-3)


def test_all_ignored_gives_empty_hist():
    probas = jnp.asarray(np.random.RandomState(1).rand(3, 600).astype(np.float32))
    labels = jnp.full(600, 255, jnp.int32)
    hist = np.asarray(
        lovasz_radix_hist(probas, labels, bins=256, chunk=512, interpret=True)
    )
    assert hist.sum() == 0
