"""Pallas fused-im2col 4x4/s2 conv vs the native XLA conv (interpret mode).

On TPU this kernel replaces the FC-Discriminator's first conv
(reference ``models/discriminator/discriminator.py:25-33``), where the XLA
emitter is ~3x off roofline for 19-channel input. Correctness is an exact
structural match to ``lax.conv_general_dilated`` up to bf16 tap rounding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtda_semanticsegmentation_tpu.ops.pallas_conv import conv4x4s2p1


def native(x, w):
    return jax.lax.conv_general_dilated(
        x.astype(jnp.float32),
        w.astype(jnp.float32),
        (2, 2),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.mark.parametrize(
    "shape,co,br,ck",
    [
        ((2, 16, 32, 19), 64, 8, 4),
        ((1, 8, 8, 3), 5, 4, 2),
        ((2, 32, 64, 19), 64, 8, 8),
        ((1, 12, 20, 7), 16, 3, 3),  # odd block/chunk fallback path
    ],
)
def test_matches_native_conv(shape, co, br, ck):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(*shape), jnp.bfloat16)
    w = jnp.asarray(rng.randn(4, 4, shape[-1], co) * 0.1, jnp.float32)
    ref = np.asarray(native(x, w))
    got = np.asarray(
        conv4x4s2p1(
            x, w, block_rows=br, chunk=ck,
            out_dtype=jnp.float32, interpret=True,
        )
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-2, rtol=5e-2)


@pytest.mark.parametrize(
    "shape,co,br,ck",
    [
        ((2, 16, 32, 19), 64, 8, 4),
        ((1, 8, 8, 3), 5, 4, 2),
        ((2, 32, 64, 7), 16, 8, 8),
    ],
)
def test_backward_kernels_match_native_vjp(shape, co, br, ck):
    from rtda_semanticsegmentation_tpu.ops.pallas_conv import (
        conv4x4s2p1_dw,
        conv4x4s2p1_dx,
    )

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(*shape), jnp.float32)
    w = jnp.asarray(rng.randn(4, 4, shape[-1], co) * 0.1, jnp.float32)
    dy = jnp.asarray(
        rng.randn(shape[0], shape[1] // 2, shape[2] // 2, co), jnp.float32
    )
    _, vjp = jax.vjp(lambda x, w: native(x, w), x, w)
    dx_ref, dw_ref = vjp(dy)

    dw = np.asarray(conv4x4s2p1_dw(x, dy, block_rows=br, chunk=ck, interpret=True))
    rel = np.abs(dw - np.asarray(dw_ref)).max() / np.abs(np.asarray(dw_ref)).max()
    assert rel < 2e-2, rel

    dx = np.asarray(
        conv4x4s2p1_dx(dy, w, block_rows=br, chunk=ck, out_dtype=jnp.float32, interpret=True)
    )
    rel = np.abs(dx - np.asarray(dx_ref)).max() / np.abs(np.asarray(dx_ref)).max()
    assert rel < 2e-2, rel


def test_fused_custom_vjp_grad_path():
    """jax.grad through fused_conv4x4s2p1 == grad through the native conv."""
    from rtda_semanticsegmentation_tpu.ops.pallas_conv import fused_conv4x4s2p1

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.rand(1, 16, 16, 5), jnp.float32)
    w = jnp.asarray(rng.randn(4, 4, 5, 8) * 0.1, jnp.float32)
    dy_w = jnp.asarray(rng.randn(1, 8, 8, 8), jnp.float32)

    def loss_fused(x, w):
        y = fused_conv4x4s2p1(x, w, 8, 4, jnp.float32, True)
        return jnp.sum(y * dy_w)

    def loss_native(x, w):
        return jnp.sum(native(x, w) * dy_w)

    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(x, w)
    gx_n, gw_n = jax.grad(loss_native, argnums=(0, 1))(x, w)
    # bf16 MXU operands: compare against the gradient's own scale
    for got, ref in ((gx_f, gx_n), (gw_f, gw_n)):
        got, ref = np.asarray(got), np.asarray(ref)
        rel = np.abs(got - ref).max() / np.abs(ref).max()
        assert rel < 1e-2, rel


def test_zero_padding_edges():
    """Border outputs must see zeros outside the image, exactly."""
    x = jnp.ones((1, 8, 8, 2), jnp.float32)
    w = jnp.ones((4, 4, 2, 1), jnp.float32)
    ref = np.asarray(native(x, w))
    got = np.asarray(
        conv4x4s2p1(
            x, w, block_rows=4, chunk=2,
            out_dtype=jnp.float32, interpret=True,
        )
    )
    np.testing.assert_allclose(got, ref, atol=1e-3)
    # corner: only 3x3 of the 4x4 window inside -> 9*2, interior 16*2
    assert got[0, 0, 0, 0] == pytest.approx(18.0)
    assert got[0, 1, 1, 0] == pytest.approx(32.0)
