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
from rtda_semanticsegmentation_tpu.models.quantize import calibrate, freeze, quantized_model
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
    # clip=1.0 (the default: exact per-channel max) pins the scheme for the
    # tight L2 check; the opt-in quantile clip is covered by
    # test_bisenet_int8_quantile_clip_agreement below.
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


def test_bisenet_int8_quantile_clip_agreement(bisenet_quant):
    """The opt-in quantile clip (quant_clip < 1; the default is the exact
    per-channel max, see ModelConfig) still serves: argmax agreement holds
    even on random-init weights, where clipping is most costly
    (near-Gaussian activations have no outliers to discard)."""
    cfg, model, variables, x = bisenet_quant
    cfg = dataclasses.replace(cfg, quant_clip=0.999)
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


def test_frozen_conv_primitive_matches_int8_conv():
    """Single conv: freeze_weights + int8_conv_frozen reproduce int8_conv's
    unsigned bias-corrected output up to f32 reassociation only
    ((y + zp)*sw vs y*sw + zp*sw) — ~1e-7 relative."""
    from rtda_semanticsegmentation_tpu.ops.quant import (
        freeze_weights,
        int8_conv_frozen,
    )

    rng = np.random.RandomState(0)
    x = jnp.asarray(np.abs(rng.randn(2, 16, 16, 64)).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 64, 32).astype(np.float32) * 0.05)
    absmax = jnp.max(jnp.abs(x), axis=(0, 1, 2))
    mean = jnp.mean(x, axis=(0, 1, 2))
    pad = ((1, 1), (1, 1))
    ref = np.asarray(int8_conv(
        x, w, absmax, (1, 1), pad, unsigned=True, in_mean=mean,
        out_dtype=jnp.float32,
    ))
    wq, sw, c = freeze_weights(w, absmax, mean)
    out = np.asarray(int8_conv_frozen(
        x, wq, sw, c, absmax, (1, 1), pad, out_dtype=jnp.float32
    ))
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-5


def _frozen_vs_int8(cfg, cal, frozen_vars, x):
    ref = np.asarray(quantized_model(cfg).apply(cal, x, False), np.float32)
    out = np.asarray(
        quantized_model(cfg, frozen=True).apply(frozen_vars, x, False),
        np.float32,
    )
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    agree = (out.argmax(-1) == ref.argmax(-1)).mean()
    return rel, agree


def test_bisenet_frozen_matches_int8(bisenet_quant):
    """calibrate -> freeze precomputes (wq, sw, c); per conv the frozen
    path differs from int8 only by f32 reassociation (exact at the
    primitive, test above), but each DOWNSTREAM activation quantizer's
    round() amplifies boundary-straddling values to a full quant step —
    so whole-model equivalence is the recompile class (same phenomenon as
    the AOT artifact's 0.9998 agreement, PERFORMANCE.md), not bitwise."""
    cfg, model, variables, x = bisenet_quant
    cal = calibrate(cfg, variables, [x])
    frozen_vars = freeze(cfg, cal)
    rel, agree = _frozen_vs_int8(cfg, cal, frozen_vars, x)
    assert rel < 0.01, rel
    assert agree > 0.99, agree


def test_frozen_serves_other_resolutions(bisenet_quant):
    """The frozen constants are weight-space only — freezing at the tiny
    dummy resolution must serve any other input size equivalently to the
    live int8 path at that size."""
    cfg, model, variables, x = bisenet_quant
    cal = calibrate(cfg, variables, [x])
    frozen_vars = freeze(cfg, cal)
    rng = np.random.RandomState(3)
    x2 = jnp.asarray(rng.randn(1, 96, 160, 3).astype(np.float32))
    rel, agree = _frozen_vs_int8(cfg, cal, frozen_vars, x2)
    assert rel < 0.01, rel
    assert agree > 0.99, agree


def test_freeze_requires_calibration(bisenet_quant):
    cfg, model, variables, x = bisenet_quant
    with pytest.raises(ValueError, match="calibrated"):
        freeze(cfg, variables)


def test_freeze_respects_quant_skip(bisenet_quant):
    """Skipped convs stay on the bf16 path: no quant_frozen entries for
    them, and the frozen model still serves equivalently to live int8."""
    cfg, model, variables, x = bisenet_quant
    cfg = dataclasses.replace(cfg, quant_skip=("ffm", "layer4"))
    cal = calibrate(cfg, variables, [x])
    frozen_vars = freeze(cfg, cal)
    paths = [
        "/".join(str(getattr(p, "key", p)) for p in kp)
        for kp, _ in jax.tree_util.tree_leaves_with_path(
            frozen_vars["quant_frozen"]
        )
    ]
    assert paths and not any("ffm" in p or "layer4" in p for p in paths)
    rel, agree = _frozen_vs_int8(cfg, cal, frozen_vars, x)
    assert agree > 0.99, agree


def test_deeplabv2_freeze_serves():
    cfg = ModelConfig(name="deeplabv2", compute_dtype="float32")
    model = build_model(cfg)
    rng = np.random.RandomState(5)
    variables = init_model(
        model, jax.random.PRNGKey(0), (1, 64, 128, 3), train=False
    )
    x = jnp.asarray(rng.randn(1, 64, 128, 3).astype(np.float32))
    frozen_vars = freeze(cfg, calibrate(cfg, variables, [x]))
    out = quantized_model(cfg, frozen=True).apply(frozen_vars, x, False)
    assert out.shape == (1, 64, 128, 19)
    assert bool(jnp.isfinite(out).all())


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
    # below-min_ch convs (default 128 since r5: thin-channel large-spatial
    # convs are bandwidth-bound and int8's s32-accumulator HBM round trip
    # makes them SLOWER than bf16 — scripts/bench_int8_policy.py) must not
    # be on the int8 path: the RGB stems (ci=3) and the 64-in convs
    # (spatial convblock2, layer1)
    assert not any("convblock1" in p and "spatial_path" in p for p in paths)
    assert not any(p.endswith("stem/conv/in_absmax") for p in paths)
    assert not any("convblock2" in p and "spatial_path" in p for p in paths)
    assert not any("layer1_" in p for p in paths)
    # channel-rich convs must be
    assert any("spatial_path" in p and "convblock3" in p for p in paths)
    assert any("ffm" in p for p in paths)
    # per-INPUT-CHANNEL stats: 1-D, non-negative, and not all dead (a
    # channel that is exactly zero on the calibration set records 0 and is
    # served as ~0 via the eps-floored scale — correct for dead channels).
    # The collection also carries in_mean (1-D) and the calib_batches
    # counter (scalar) for the bias correction.
    for p, v in flat.items():
        v = np.asarray(v)
        if p.endswith("calib_batches"):
            assert v.ndim == 0, p
            continue
        assert v.ndim == 1, p
        if p.endswith("in_absmax"):
            assert (v >= 0).all() and v.max() > 0, p


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


def test_calib_clip_stride_not_channel_aliased():
    """Regression (r2 advisor, high): a power-of-two subsample stride over a
    flattened NHWC tensor with power-of-two channels sampled only C/step
    channels; with heterogeneous per-channel magnitudes the quantile came
    out badly biased (2.4x-too-small scale -> mass int8 saturation). The
    stride must be coprime with the channel axis."""
    from rtda_semanticsegmentation_tpu.ops.quant import calib_clip

    rng = np.random.RandomState(2)
    # (4, 64, 128, 64) = 2M elements -> step 2 before the fix; channels get
    # magnitudes spanning 1..8x so missing channels skews the quantile.
    c_scale = np.linspace(1.0, 8.0, 64, dtype=np.float32)
    x_np = rng.randn(4, 64, 128, 64).astype(np.float32) * c_scale
    got = float(calib_clip(jnp.asarray(x_np), 0.999))
    expect = float(np.quantile(np.abs(x_np), 0.999))
    assert abs(got - expect) / expect < 0.05, (got, expect)


def test_calib_clip_channels_matches_numpy():
    """Per-channel quantile == numpy per-channel quantile (incl. the
    subsampled path), on a tensor with heterogeneous channel scales."""
    from rtda_semanticsegmentation_tpu.ops.quant import calib_clip_channels

    rng = np.random.RandomState(5)
    c_scale = np.linspace(0.5, 16.0, 32, dtype=np.float32)
    x_np = rng.randn(2, 32, 64, 32).astype(np.float32) * c_scale
    got = np.asarray(calib_clip_channels(jnp.asarray(x_np), 0.999))
    expect = np.quantile(np.abs(x_np).reshape(-1, 32), 0.999, axis=0)
    np.testing.assert_allclose(got, expect, rtol=1e-5)
    # exact-max mode
    got_max = np.asarray(calib_clip_channels(jnp.asarray(x_np), 1.0))
    np.testing.assert_allclose(
        got_max, np.abs(x_np).reshape(-1, 32).max(0), rtol=1e-6
    )
    # large tensor -> subsampled rows, still per-channel-faithful
    big = rng.randn(4, 64, 256, 64).astype(np.float32) * np.linspace(
        1, 8, 64, dtype=np.float32
    )
    got_big = np.asarray(calib_clip_channels(jnp.asarray(big), 0.999))
    exp_big = np.quantile(np.abs(big).reshape(-1, 64), 0.999, axis=0)
    assert (np.abs(got_big - exp_big) / exp_big < 0.05).all()


def test_int8_conv_per_channel_beats_per_tensor_on_heterogeneous_input():
    """The motivating case for the channel-folded scheme: input channels
    spanning a 50x magnitude range. Per-tensor scales crush the small
    channels to a few int8 codes; per-channel scales keep them faithful."""
    from rtda_semanticsegmentation_tpu.ops.quant import int8_conv

    rng = np.random.RandomState(6)
    c_scale = np.logspace(-1, np.log10(5.0), 32).astype(np.float32)
    x = jnp.asarray(rng.randn(2, 16, 16, 32).astype(np.float32) * c_scale)
    # weights counter-scaled so every channel contributes equally to the
    # output — the regime where per-tensor input quantization loses the
    # small channels' information entirely
    w = jnp.asarray(
        rng.randn(3, 3, 32, 64).astype(np.float32) * 0.05
        / c_scale[:, None]
    )
    ref = np.asarray(_f32_conv(x, w))
    per_channel = np.asarray(int8_conv(
        x, w, jnp.max(jnp.abs(x), axis=(0, 1, 2)), (1, 1), ((1, 1), (1, 1)),
        out_dtype=jnp.float32,
    ))
    per_tensor = np.asarray(int8_conv(
        x, w, jnp.max(jnp.abs(x)), (1, 1), ((1, 1), (1, 1)),
        out_dtype=jnp.float32,
    ))
    err_pc = np.linalg.norm(per_channel - ref) / np.linalg.norm(ref)
    err_pt = np.linalg.norm(per_tensor - ref) / np.linalg.norm(ref)
    assert err_pc < 0.02, err_pc
    assert err_pc < 0.5 * err_pt, (err_pc, err_pt)


@pytest.mark.parametrize(
    "strides,dilation", [((1, 1), (1, 1)), ((2, 2), (1, 1)), ((1, 1), (2, 2))]
)
def test_int8_conv_unsigned_exact_on_grid(strides, dilation):
    """The unsigned scheme's zero-point correction and zero-code padding are
    EXACT integer arithmetic: inputs placed exactly on the quantization grid
    (x = s*k, k in [0,254]) and weights on theirs must reproduce the f32
    conv bit-for-bit — including border pixels, where symmetric zero-padding
    would need position-dependent corrections."""
    rng = np.random.RandomState(3)
    ci, co = 32, 16
    m = jnp.asarray(np.full(ci, 254.0, np.float32))  # -> s = 1.0/channel
    x = jnp.asarray(
        rng.randint(0, 255, size=(2, 9, 11, ci)).astype(np.float32)
    )
    # weights = integers * 2^-8: exactly f32-representable, and forcing
    # |wi|=127 into every output channel makes the computed per-channel
    # scale exactly 2^-8 (power-of-two division is exact), so the whole
    # pipeline is integer math and the comparison is BITWISE
    wi = rng.randint(-127, 128, size=(3, 3, ci, co)).astype(np.float32)
    wi[0, 0, 0, :] = np.where(wi[0, 0, 0, :] < 0, -127.0, 127.0)
    w = jnp.asarray(wi * 2.0 ** -8)
    pad = ((dilation[0], dilation[0]), (dilation[1], dilation[1]))
    ref = np.asarray(
        _f32_conv(x, w, strides=strides, padding=pad, dilation=dilation)
    )
    got = np.asarray(int8_conv(
        x, w, m, strides, pad, dilation=dilation, out_dtype=jnp.float32,
        unsigned=True,
    ))
    np.testing.assert_array_equal(got, ref)


def test_int8_conv_unsigned_halves_rounding_noise():
    """On generic post-ReLU inputs the unsigned grid (254 steps over [0, m])
    must beat the signed grid (127 steps) — roughly half the activation
    rounding error."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(
        np.maximum(rng.randn(2, 16, 16, 32), 0.0).astype(np.float32) * 60.0
    )
    # exactly-representable weights (integer * 2^-8, maxabs forced to 127)
    # and a power-of-two-friendly clip stat (254 -> steps 2 resp. 1, folds
    # exact) so weight-rounding noise is zero in BOTH schemes and the
    # measured error is PURELY activation rounding — which the unsigned
    # grid halves
    wi = rng.randint(-127, 128, size=(3, 3, 32, 64)).astype(np.float32)
    wi[0, 0, 0, :] = np.where(wi[0, 0, 0, :] < 0, -127.0, 127.0)
    w = jnp.asarray(wi * 2.0 ** -8)
    m = jnp.asarray(np.full(32, 254.0, np.float32))
    ref = np.asarray(_f32_conv(x, w))
    errs = {}
    for unsigned in (False, True):
        got = np.asarray(int8_conv(
            x, w, m, (1, 1), ((1, 1), (1, 1)), out_dtype=jnp.float32,
            unsigned=unsigned,
        ))
        errs[unsigned] = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert errs[True] < 0.7 * errs[False], errs
    assert errs[True] < 0.01, errs


def test_int8_conv_unsigned_clamps_negatives():
    """x < 0 (outside the scheme's domain) must clamp to the zero code, not
    wrap or saturate weirdly — equivalent to an extra ReLU."""
    x = jnp.asarray(
        np.array([[-5.0, 0.0, 1.0, 254.0]], np.float32).reshape(1, 1, 4, 1)
    )
    w = jnp.ones((1, 1, 1, 1), jnp.float32)
    m = jnp.asarray([254.0], jnp.float32)
    got = np.asarray(int8_conv(
        x, w, m, (1, 1), ((0, 0), (0, 0)), out_dtype=jnp.float32,
        unsigned=True,
    )).reshape(-1)
    np.testing.assert_allclose(got, [0.0, 0.0, 1.0, 254.0], atol=0.51)


def test_calibration_is_max_merged(bisenet_quant):
    cfg, model, variables, x = bisenet_quant
    small, big = x * 0.1, x * 2.0
    cal_a = calibrate(cfg, variables, [small, big])
    cal_b = calibrate(cfg, variables, [big, small])
    a = jax.tree_util.tree_leaves(cal_a["quant_stats"])
    b = jax.tree_util.tree_leaves(cal_b["quant_stats"])
    for va, vb in zip(a, b):
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), rtol=1e-6)


def test_int8_conv_bias_correction_zero_when_weights_on_grid():
    # kernel already exactly representable after folding -> zero residual ->
    # in_mean must change nothing
    rng = np.random.RandomState(3)
    x = jnp.asarray(np.abs(rng.randn(2, 8, 8, 16)).astype(np.float32))
    m = jnp.max(jnp.abs(x), axis=(0, 1, 2))
    s = np.maximum(np.asarray(m), 1e-12) / 254.0
    # integer multiples of (sw / s_fold): build folded grid then unfold.
    # Pin max|wq| = 127 per output channel so quantize_weight recovers the
    # same scale and the roundtrip is exact.
    wq = rng.randint(-126, 127, size=(3, 3, 16, 8)).astype(np.float32)
    wq[0, 0, 0, :] = 127.0
    sw = np.float32(0.01)
    w = jnp.asarray(wq * sw / s[None, None, :, None])
    mean = jnp.asarray(np.abs(rng.randn(16)).astype(np.float32))
    kw = dict(
        strides=(1, 1), padding=((1, 1), (1, 1)), out_dtype=jnp.float32,
        unsigned=True,
    )
    base = np.asarray(int8_conv(x, w, m, **kw))
    corrected = np.asarray(int8_conv(x, w, m, in_mean=mean, **kw))
    np.testing.assert_allclose(corrected, base, atol=1e-4, rtol=1e-5)


def test_int8_conv_bias_correction_removes_mean_shift():
    # Large-ci conv with non-negative input (post-ReLU regime): weight
    # rounding residuals accumulate into a per-output-channel mean shift;
    # the closed-form correction must shrink the mean error vs the exact
    # f32 conv (numpy oracle), and not blow up the per-pixel error.
    rng = np.random.RandomState(4)
    ci, co = 64, 32
    x = jnp.asarray(np.abs(rng.randn(2, 16, 16, ci)).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, ci, co) * 0.05).astype(np.float32))
    m = jnp.max(jnp.abs(x), axis=(0, 1, 2))
    mean = jnp.mean(x, axis=(0, 1, 2))
    kw = dict(
        strides=(1, 1), padding=((1, 1), (1, 1)), out_dtype=jnp.float32,
        unsigned=True,
    )
    ref = np.asarray(_f32_conv(x, w))
    base = np.asarray(int8_conv(x, w, m, **kw))
    corrected = np.asarray(int8_conv(x, w, m, in_mean=mean, **kw))
    # interior pixels only (the correction assumes the full receptive field)
    r, b, c = ref[:, 1:-1, 1:-1], base[:, 1:-1, 1:-1], corrected[:, 1:-1, 1:-1]
    shift_base = np.abs((b - r).mean(axis=(0, 1, 2)))
    shift_corr = np.abs((c - r).mean(axis=(0, 1, 2)))
    # mean shift shrinks for the channels where it was material
    sel = shift_base > np.median(shift_base)
    assert shift_corr[sel].mean() < 0.5 * shift_base[sel].mean()
    # and overall per-pixel error does not get worse
    assert np.abs(c - r).mean() <= np.abs(b - r).mean() * 1.02


def test_calibrate_records_running_mean(bisenet_quant):
    cfg, model, variables, x = bisenet_quant
    cal = calibrate(cfg, variables, [x * 0.5, x * 1.5])
    stats = cal["quant_stats"]
    leaves_mean = [
        v for p, v in jax.tree_util.tree_flatten_with_path(stats)[0]
        if any(getattr(k, "key", "") == "in_mean" for k in p)
    ]
    leaves_cnt = [
        v for p, v in jax.tree_util.tree_flatten_with_path(stats)[0]
        if any(getattr(k, "key", "") == "calib_batches" for k in p)
    ]
    assert leaves_mean and leaves_cnt
    assert all(float(c) == 2.0 for c in leaves_cnt)
    # means must be finite and non-negative (post-ReLU inputs); at least one
    # conv sees a strictly positive mean
    assert all(np.isfinite(np.asarray(v)).all() for v in leaves_mean)
    assert any(float(jnp.max(v)) > 0 for v in leaves_mean)
