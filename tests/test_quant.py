"""int8 PTQ serving path: primitives, policy, and end-to-end accuracy.

The quantized path must (a) be numerically close to the f32/bf16 forward,
(b) share the exact parameter tree with the unquantized model (one
checkpoint format), and (c) only quantize convs the channel policy selects.
CPU note: XLA's CPU backend computes s8 x s8 -> s32 convs bit-exactly
(verified against an int32 conv), so these tests exercise the real path.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtda_semanticsegmentation_tpu.config import ModelConfig
from rtda_semanticsegmentation_tpu.models.factory import build_model, init_model
from rtda_semanticsegmentation_tpu.models.quantize import calibrate, quantized_model
from rtda_semanticsegmentation_tpu.ops.quant import (
    int8_conv,
    quantize_act,
    quantize_weight,
)


def _f32_conv(x, w, strides=(1, 1), padding=((1, 1), (1, 1)), dilation=(1, 1)):
    return jax.lax.conv_general_dilated(
        x, w, strides, padding, rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def test_quantize_weight_per_channel_roundtrip():
    rng = np.random.RandomState(0)
    # per-channel magnitudes spanning 3 orders of magnitude
    w = rng.randn(3, 3, 16, 8).astype(np.float32) * np.logspace(
        -2, 1, 8, dtype=np.float32
    )
    wq, sw = quantize_weight(jnp.asarray(w))
    assert wq.dtype == jnp.int8 and sw.shape == (8,)
    err = np.abs(np.asarray(wq, np.float32) * np.asarray(sw) - w)
    # round-to-nearest: error bounded by half a step, per channel
    assert (err <= 0.5 * np.asarray(sw)[None, None, None, :] + 1e-7).all()


def test_quantize_act_saturates():
    x = jnp.asarray([-300.0, -1.0, 0.0, 0.5, 300.0])
    q = quantize_act(x, jnp.float32(1.0))
    assert q.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(q), [-127, -1, 0, 0, 127])


@pytest.mark.parametrize("dilation", [(1, 1), (2, 2)])
def test_int8_conv_close_to_f32(dilation):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 16, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 32, 64).astype(np.float32) * 0.05)
    pad = ((dilation[0], dilation[0]), (dilation[1], dilation[1]))
    ref = np.asarray(_f32_conv(x, w, padding=pad, dilation=dilation))
    out = np.asarray(
        int8_conv(
            x, w, jnp.max(jnp.abs(x)), (1, 1), pad,
            dilation=dilation, out_dtype=jnp.float32,
        ),
        np.float32,
    )
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel


@pytest.fixture(scope="module")
def bisenet_quant():
    cfg = ModelConfig(compute_dtype="float32")
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    variables = init_model(model, jax.random.PRNGKey(0), (1, 64, 128, 3), train=False)
    x = jnp.asarray(rng.randn(2, 64, 128, 3).astype(np.float32))
    return cfg, model, variables, x


def test_bisenet_int8_matches_f32(bisenet_quant):
    # clip=1.0 pins the exact max-abs scheme for the tight L2 check; the
    # default quantile clip (0.999) trades L2 on Gaussian random-init
    # activations for argmax fidelity on trained ones (heavy-tailed), and
    # is covered by test_bisenet_int8_default_clip_agreement below.
    cfg, model, variables, x = bisenet_quant
    cfg = dataclasses.replace(cfg, quant_clip=1.0)
    ref = np.asarray(model.apply(variables, x, False), np.float32)
    cal = calibrate(cfg, variables, [x])
    out = np.asarray(quantized_model(cfg).apply(cal, x, False), np.float32)
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    agree = (out.argmax(-1) == ref.argmax(-1)).mean()
    # random-init logits are the worst case for argmax agreement
    assert rel < 0.05, rel
    assert agree > 0.95, agree


def test_bisenet_int8_default_clip_agreement(bisenet_quant):
    """The default (quantile-clipped) calibration still serves: argmax
    agreement holds even on random-init weights, where clipping is most
    costly (near-Gaussian activations have no outliers to discard)."""
    cfg, model, variables, x = bisenet_quant
    assert cfg.quant_clip < 1.0  # default is the robust clip
    ref = np.asarray(model.apply(variables, x, False), np.float32)
    cal = calibrate(cfg, variables, [x])
    out = np.asarray(quantized_model(cfg).apply(cal, x, False), np.float32)
    agree = (out.argmax(-1) == ref.argmax(-1)).mean()
    assert agree > 0.93, agree


def test_deeplabv2_int8_matches_f32():
    """The dilated-conv (ASPP-fed) trunk also serves on the s8 path; the
    ASPP classifier itself stays in the compute dtype by design."""
    cfg = ModelConfig(name="deeplabv2", compute_dtype="float32", quant_clip=1.0)
    model = build_model(cfg)
    rng = np.random.RandomState(3)
    variables = init_model(model, jax.random.PRNGKey(0), (1, 64, 128, 3), train=False)
    x = jnp.asarray(rng.randn(1, 64, 128, 3).astype(np.float32))
    ref = np.asarray(model.apply(variables, x, False), np.float32)
    cal = calibrate(cfg, variables, [x])
    out = np.asarray(quantized_model(cfg).apply(cal, x, False), np.float32)
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    agree = (out.argmax(-1) == ref.argmax(-1)).mean()
    assert rel < 0.1, rel
    assert agree > 0.9, agree
    # no quant stats recorded inside the (unquantized) ASPP head
    paths = [
        "/".join(str(getattr(p, "key", p)) for p in kp)
        for kp, _ in jax.tree_util.tree_leaves_with_path(cal["quant_stats"])
    ]
    assert paths and not any("aspp" in p for p in paths)


def test_quant_modes_share_param_tree(bisenet_quant):
    cfg, model, variables, x = bisenet_quant
    for mode in ("calib", "int8"):
        m = build_model(dataclasses.replace(cfg, quant=mode))
        v = init_model(m, jax.random.PRNGKey(0), (1, 64, 128, 3), train=False)
        assert jax.tree_util.tree_structure(
            v["params"]
        ) == jax.tree_util.tree_structure(variables["params"])


def test_channel_policy_skips_few_channel_convs(bisenet_quant):
    cfg, model, variables, x = bisenet_quant
    cal = calibrate(cfg, variables, [x])
    stats = cal["quant_stats"]
    flat = {
        "/".join(str(getattr(p, "key", p)) for p in kp): v
        for kp, v in jax.tree_util.tree_leaves_with_path(stats)
    }
    paths = list(flat)
    # RGB-consuming convs (ci=3 < 64) must not be on the int8 path
    assert not any("convblock1" in p and "spatial_path" in p for p in paths)
    assert not any(p.endswith("stem/conv/in_absmax") for p in paths)
    # channel-rich convs must be
    assert any("spatial_path" in p and "convblock2" in p for p in paths)
    assert any("ffm" in p for p in paths)
    # every recorded absmax is positive after calibration
    assert all(float(v) > 0 for v in flat.values())


def test_int8_without_calibration_raises(bisenet_quant):
    cfg, model, variables, x = bisenet_quant
    with pytest.raises(Exception):
        quantized_model(cfg).apply(variables, x, False)


def test_calibrate_requires_batches(bisenet_quant):
    cfg, model, variables, x = bisenet_quant
    with pytest.raises(ValueError):
        calibrate(cfg, variables, [])


def test_calib_clip_statistic():
    """clip=1.0 is the exact max; q<1 discards outliers (the scale a lone
    huge activation would otherwise dictate — ops/quant.py::calib_clip)."""
    from rtda_semanticsegmentation_tpu.ops.quant import calib_clip

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 64, 8).astype(np.float32))
    np.testing.assert_allclose(
        float(calib_clip(x, 1.0)), float(jnp.max(jnp.abs(x))), rtol=1e-6
    )
    # inject one extreme outlier: the max chases it, the quantile does not
    x_out = x.at[0, 0, 0].set(1e4)
    assert float(calib_clip(x_out, 1.0)) == 1e4
    clipped = float(calib_clip(x_out, 0.999))
    assert clipped < 10.0, clipped  # ~p999 of N(0,1) ~= 3.3
    # and the quantile is a faithful estimate of the bulk's p999
    expect = float(np.quantile(np.abs(np.asarray(x)), 0.999))
    assert abs(clipped - expect) / expect < 0.05


def test_calib_clip_subsamples_large_inputs():
    """The strided subsample keeps calibration cheap on full-res activation
    maps without losing the estimate (tail still holds ~1k samples)."""
    from rtda_semanticsegmentation_tpu.ops.quant import calib_clip

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4 << 20).astype(np.float32))  # 4M > 1M cap
    got = float(calib_clip(x, 0.999))
    expect = float(np.quantile(np.abs(np.asarray(x)), 0.999))
    assert abs(got - expect) / expect < 0.05, (got, expect)


def test_calibration_is_max_merged(bisenet_quant):
    cfg, model, variables, x = bisenet_quant
    small, big = x * 0.1, x * 2.0
    cal_a = calibrate(cfg, variables, [small, big])
    cal_b = calibrate(cfg, variables, [big, small])
    a = jax.tree_util.tree_leaves(cal_a["quant_stats"])
    b = jax.tree_util.tree_leaves(cal_b["quant_stats"])
    for va, vb in zip(a, b):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), rtol=1e-6)
