"""Pallas tap-GEMM 3x3 conv vs native conv (interpret mode).

Targets the channel-rich small-spatial layers (PERFORMANCE.md item 9);
correctness includes the fused scale/shift/ReLU epilogue.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtda_semanticsegmentation_tpu.ops.pallas_conv3 import conv3x3s1p1


def native(x, w):
    return jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        w.astype(jnp.float32),
        (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.mark.parametrize(
    "shape,co,br",
    [
        ((2, 8, 16, 16), 24, 4),
        ((1, 16, 8, 8), 8, 8),
        ((2, 12, 20, 32), 16, 6),
        ((1, 6, 6, 4), 4, 2),
    ],
)
def test_matches_native(shape, co, br):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(*shape), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, shape[-1], co) * 0.1, jnp.float32)
    ref = np.asarray(native(x, w))
    got = np.asarray(
        conv3x3s1p1(
            x, w, block_rows=br, out_dtype=jnp.float32, interpret=True
        )
    )
    np.testing.assert_allclose(got, ref, atol=5e-2, rtol=5e-2)


def test_fused_epilogue_matches_chain():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 8, 12, 16), jnp.bfloat16)
    w = jnp.asarray(rng.randn(3, 3, 16, 8) * 0.1, jnp.float32)
    s = jnp.asarray(rng.rand(8) + 0.5, jnp.float32)
    b = jnp.asarray(rng.randn(8) * 0.1, jnp.float32)
    ref = np.maximum(np.asarray(native(x, w)) * np.asarray(s) + np.asarray(b), 0.0)
    got = np.asarray(
        conv3x3s1p1(
            x, w, s, b, block_rows=4, relu=True,
            out_dtype=jnp.float32, interpret=True,
        )
    )
    np.testing.assert_allclose(got, ref, atol=5e-2, rtol=5e-2)


def test_zero_padding_borders():
    x = jnp.ones((1, 6, 6, 3), jnp.float32)
    w = jnp.ones((3, 3, 3, 1), jnp.float32)
    got = np.asarray(
        conv3x3s1p1(x, w, block_rows=2, out_dtype=jnp.float32, interpret=True)
    )
    assert got[0, 0, 0, 0] == pytest.approx(4 * 3)  # corner: 2x2 window
    assert got[0, 0, 3, 0] == pytest.approx(6 * 3)  # edge: 2x3
    assert got[0, 3, 3, 0] == pytest.approx(9 * 3)  # interior
