"""Fused bilinear-upsample+argmax vs the jax.image.resize reference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtda_semanticsegmentation_tpu.ops.upsample import (
    _interp_axis,
    upsample_bilinear_argmax,
)


def _full_field(x, fh, fw):
    """Materialized phase-decomposed bilinear field (the fused op's values)."""
    b, h, w, c = x.shape
    y = _interp_axis(x.astype(jnp.float32), 1, fh)  # (B, h, fh, w, C)
    y = _interp_axis(y, 3, fw)  # (B, h, fh, w, fw, C)
    return y.reshape(b, h * fh, w * fw, c)


class TestValuesMatchJaxImageResize:
    @pytest.mark.parametrize("fh,fw", [(8, 8), (2, 2), (4, 2), (1, 8)])
    def test_interior_and_edges(self, fh, fw):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 5, 7, 4).astype(np.float32))
        b, h, w, c = x.shape
        ours = _full_field(x, fh, fw)
        ref = jax.image.resize(x, (b, h * fh, w * fw, c), method="bilinear")
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), atol=1e-5, rtol=1e-5
        )

    def test_bisenet_head_shape(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(1, 8, 16, 19).astype(np.float32))
        ours = _full_field(x, 8, 8)
        ref = jax.image.resize(x, (1, 64, 128, 19), method="bilinear")
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), atol=1e-5, rtol=1e-5
        )


class TestFusedArgmax:
    def test_matches_reference_path(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(2, 6, 10, 19).astype(np.float32))
        preds = upsample_bilinear_argmax(x, (48, 80))
        ref = jnp.argmax(
            jax.image.resize(x, (2, 48, 80, 19), method="bilinear"), -1
        )
        assert preds.dtype == jnp.int32
        np.testing.assert_array_equal(np.asarray(preds), np.asarray(ref))

    def test_bf16_inputs_high_agreement(self):
        # bf16 logits: fused path interpolates in f32, the reference path in
        # bf16 — near-ties may flip, but agreement must stay ~1.
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(2, 8, 8, 19).astype(np.float32)).astype(
            jnp.bfloat16
        )
        preds = upsample_bilinear_argmax(x, (64, 64))
        ref = jnp.argmax(
            jax.image.resize(x, (2, 64, 64, 19), method="bilinear"), -1
        )
        agree = float(jnp.mean(preds == ref))
        assert agree > 0.99, agree

    def test_identity_factor(self):
        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.randn(1, 4, 4, 3).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(upsample_bilinear_argmax(x, (4, 4))),
            np.asarray(jnp.argmax(x, -1)),
        )

    def test_non_integer_factor_raises(self):
        x = jnp.zeros((1, 5, 5, 3))
        with pytest.raises(ValueError, match="integer factors"):
            upsample_bilinear_argmax(x, (12, 10))

    def test_jit_compatible(self):
        x = jnp.zeros((1, 4, 4, 3))
        out = jax.jit(
            lambda a: upsample_bilinear_argmax(a, (32, 32))
        )(x)
        assert out.shape == (1, 32, 32)


def _np_bilinear_upsample(x: np.ndarray, fh: int, fw: int) -> np.ndarray:
    """Pure-numpy half-pixel-center bilinear upsample with clamp-to-edge
    (the CLAUDE.md numpy oracle for ops/upsample.py — independent of any
    JAX implementation)."""
    b, h, w, c = x.shape

    def interp_axis(arr, n, f, axis):
        coords = (np.arange(n * f) + 0.5) / f - 0.5
        lo = np.floor(coords)
        wt = (coords - lo).astype(np.float64)
        i0 = np.clip(lo.astype(int), 0, n - 1)
        i1 = np.clip(lo.astype(int) + 1, 0, n - 1)
        a0 = np.take(arr, i0, axis=axis)
        a1 = np.take(arr, i1, axis=axis)
        shape = [1] * arr.ndim
        shape[axis] = n * f
        wt = wt.reshape(shape)
        return (1.0 - wt) * a0 + wt * a1

    y = interp_axis(x.astype(np.float64), h, fh, 1)
    y = interp_axis(y, w, fw, 2)
    return y.astype(np.float32)


class TestNumpyOracle:
    @pytest.mark.parametrize("fh,fw", [(8, 8), (2, 4), (1, 2), (3, 3)])
    def test_full_field_matches_numpy(self, fh, fw):
        rng = np.random.RandomState(5)
        x = rng.randn(2, 5, 6, 7).astype(np.float32)
        ours = np.asarray(_full_field(jnp.asarray(x), fh, fw))
        want = _np_bilinear_upsample(x, fh, fw)
        np.testing.assert_allclose(ours, want, atol=1e-5, rtol=1e-5)

    def test_fused_argmax_matches_numpy(self):
        rng = np.random.RandomState(6)
        x = rng.randn(1, 4, 6, 19).astype(np.float32)
        preds = np.asarray(upsample_bilinear_argmax(jnp.asarray(x), (16, 24)))
        want = np.argmax(_np_bilinear_upsample(x, 4, 4), -1)
        np.testing.assert_array_equal(preds, want)
