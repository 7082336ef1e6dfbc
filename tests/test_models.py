"""Model zoo: output shapes, train/eval signatures, parameter counts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtda_semanticsegmentation_tpu.models import (
    BiSeNet,
    DeepLabV2,
    FCDiscriminator,
)
from rtda_semanticsegmentation_tpu.models.layers import max_pool_torch


def _n_params(variables):
    return sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))


def test_bisenet_resnet18_shapes_and_signature():
    model = BiSeNet(num_classes=19, context_path="resnet18", dtype=jnp.float32)
    x = jnp.zeros((2, 64, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, True)
    # training: (main, aux1, aux2), all at input resolution
    out, a1, a2 = model.apply(
        variables, x, True, mutable=["batch_stats"]
    )[0]
    assert out.shape == (2, 64, 128, 19)
    assert a1.shape == (2, 64, 128, 19)
    assert a2.shape == (2, 64, 128, 19)
    # eval: single tensor
    out_eval = model.apply(variables, x, False)
    assert out_eval.shape == (2, 64, 128, 19)
    assert np.isfinite(np.asarray(out_eval)).all()
    # ResNet-18 trunk (11.18M) + BiSeNet heads => ~12-14M params
    n = _n_params(variables)
    assert 11.5e6 < n < 14.5e6, n


def test_bisenet_has_batch_stats_collection():
    model = BiSeNet(num_classes=19, context_path="resnet18", dtype=jnp.float32)
    x = jnp.zeros((1, 32, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, True)
    assert "batch_stats" in variables


@pytest.mark.slow
def test_bisenet_resnet101_shapes():
    model = BiSeNet(num_classes=19, context_path="resnet101", dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, False)
    out = model.apply(variables, x, False)
    assert out.shape == (1, 64, 64, 19)


def test_deeplabv2_shapes_and_output_stride():
    model = DeepLabV2(num_classes=19, dtype=jnp.float32)
    x = jnp.zeros((1, 65, 129, 3), jnp.float32)  # odd sizes exercise ceil_mode
    variables = model.init(jax.random.PRNGKey(0), x, False)
    out = model.apply(variables, x, False)
    assert out.shape == (1, 65, 129, 19)
    # train signature (logits, None, None) — reference deeplabv2.py:126-129
    out_t, n1, n2 = model.apply(variables, x, True, mutable=["batch_stats"])[0]
    assert out_t.shape == (1, 65, 129, 19) and n1 is None and n2 is None
    # ResNet-101 trunk is ~42.5M + ASPP head
    n = _n_params(variables)
    assert 42e6 < n < 46e6, n


def test_discriminator_shapes_and_exact_param_count():
    model = FCDiscriminator(num_classes=19, ndf=64, dtype=jnp.float32)
    x = jnp.zeros((2, 512, 1024, 19), jnp.float32)
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 19)))
    )
    # shape check via eval_shape to avoid a big CPU conv
    out = jax.eval_shape(lambda v, x: model.apply(v, x), variables, x)
    assert out.shape == (2, 16, 32, 1)
    # 720x1280 -> 22x40 (floor division per stride-2 conv chain)
    out2 = jax.eval_shape(
        lambda v, x: model.apply(v, x),
        variables,
        jnp.zeros((2, 720, 1280, 19), jnp.float32),
    )
    assert out2.shape == (2, 22, 40, 1)
    # reference self-test prints ~2.78M params (discriminator.py:100-102)
    n = sum(
        int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(variables["params"])
    )
    assert n == 2_781_121


def test_max_pool_torch_ceil_mode():
    # torch MaxPool2d(3, 2, 1, ceil_mode=True) on 256 -> 129; floor -> 128
    x = jnp.arange(256, dtype=jnp.float32).reshape(1, 256, 1, 1)
    x = jnp.broadcast_to(x, (1, 256, 4, 1))
    assert max_pool_torch(x, 3, 2, 1, ceil_mode=True).shape == (1, 129, 3, 1)
    assert max_pool_torch(x, 3, 2, 1, ceil_mode=False).shape == (1, 128, 2, 1)
    # values: max over each window, matching torch's -inf padding semantics
    got = max_pool_torch(x, 3, 2, 1, ceil_mode=True)[0, :, 0, 0]
    want = [min(2 * i + 1, 255) for i in range(129)]
    np.testing.assert_array_equal(np.asarray(got), want)


def test_conv_phase_matches_lax_conv():
    """Multi-phase coarse-stride conv == plain conv (exact rearrangement)."""
    from rtda_semanticsegmentation_tpu.models.layers import conv_phase

    rng = np.random.RandomState(0)
    cases = [
        # (H, W, ci, co, k, stride, pad, phase) — stem 7x7/2/3 and spatial
        # 3x3/2/1 at phase 4, plus stride-1/downsample shape classes.
        (64, 96, 3, 16, 7, 2, 3, 4),
        (64, 96, 3, 16, 3, 2, 1, 4),
        (32, 48, 8, 8, 3, 1, 1, 2),
        (32, 48, 4, 8, 1, 1, 0, 2),
        (32, 48, 8, 16, 3, 2, 1, 2),
        (32, 48, 8, 16, 1, 2, 0, 2),
    ]
    for h, w, ci, co, k, s, p, f in cases:
        x = jnp.asarray(rng.randn(2, h, w, ci), jnp.float32)
        wts = jnp.asarray(rng.randn(k, k, ci, co) * 0.2, jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, wts, (s, s), ((p, p), (p, p)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        got = conv_phase(x, wts, s, p, f)
        assert got.shape == ref.shape, (got.shape, ref.shape, (k, s, p, f))
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5,
            err_msg=f"case {(h, w, ci, co, k, s, p, f)}",
        )


def test_bisenet_fast_input_equivalence():
    """fast_input=True (phase-conv stems) matches the plain compute path;
    the parameter tree is identical so one init serves both."""
    x = jnp.asarray(
        np.random.RandomState(1).rand(1, 64, 128, 3), jnp.float32
    )
    fast = BiSeNet(num_classes=19, dtype=jnp.float32, fast_input=True)
    slow = BiSeNet(num_classes=19, dtype=jnp.float32, fast_input=False)
    variables = fast.init(jax.random.PRNGKey(0), x, False)
    assert jax.tree_util.tree_structure(
        variables
    ) == jax.tree_util.tree_structure(slow.init(jax.random.PRNGKey(0), x, False))
    out_fast = fast.apply(variables, x, False)
    out_slow = slow.apply(variables, x, False)
    np.testing.assert_allclose(
        np.asarray(out_fast), np.asarray(out_slow), rtol=1e-4, atol=1e-5
    )


def test_final_conv_commutes_with_upsample():
    """1x1 conv and bilinear resize commute exactly (both linear, disjoint
    axes; bias passes through because interpolation weights sum to 1) —
    justifies computing the head conv at 1/8 resolution
    (reference order: upsample then conv, build_bisenet.py:164-165)."""
    from rtda_semanticsegmentation_tpu.models.layers import resize_bilinear

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 16, 19), jnp.float32)
    kern = jnp.asarray(rng.randn(19, 19) * 0.3, jnp.float32)
    bias = jnp.asarray(rng.randn(19) * 0.1, jnp.float32)
    conv = lambda t: jnp.einsum("bhwc,cd->bhwd", t, kern) + bias
    a = conv(resize_bilinear(x, (64, 128)))
    b = resize_bilinear(conv(x), (64, 128))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)


def test_max_pool_torch_ceil_mode_drops_padding_only_window():
    """torch drops a ceil-mode window starting entirely in right padding
    (ATen pooling_output_shape); oracle-checked against torch itself."""
    import torch

    rng = np.random.RandomState(0)
    for n, k, s, p in [(5, 3, 3, 1), (7, 2, 2, 1), (6, 3, 3, 1), (5, 3, 2, 1)]:
        x = rng.randn(1, n, n, 1).astype(np.float32)
        got = np.asarray(max_pool_torch(jnp.asarray(x), k, s, p, ceil_mode=True))
        want = (
            torch.nn.functional.max_pool2d(
                torch.from_numpy(x.transpose(0, 3, 1, 2)), k, s, p,
                ceil_mode=True,
            )
            .numpy()
            .transpose(0, 2, 3, 1)
        )
        assert got.shape == want.shape, (n, k, s, p, got.shape, want.shape)
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_resnet18_rejects_reduced_output_stride():
    from rtda_semanticsegmentation_tpu.models.resnet import ResNetFeatures

    model = ResNetFeatures(depth=18, output_stride=8)
    with pytest.raises(ValueError, match="dilated"):
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), False)
