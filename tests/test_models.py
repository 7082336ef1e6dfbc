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
