"""Oracle tests for the fused-epilogue Pallas s8 conv (interpret mode).

Status note (round 5, PERFORMANCE.md "int8 conv emitter study"): the kernel
is bit-exact on TPU but LOSES to the native XLA int8 conv at the
channel-rich shapes (native runs 192-344 TF/s marginal — near the 394 TOP/s
peak) and cannot beat bf16 at the 64-channel large-spatial shapes either
(lane-starved MXU). It is kept as validated machinery; the shipped fix for
the int8 serving gap is the quantization channel POLICY.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rtda_semanticsegmentation_tpu.ops.pallas_conv_int8 import int8_conv3x3s1p1


def _case(seed, B=2, H=16, W=32, C=64, CO=128):
    rng = np.random.RandomState(seed)
    xq = jnp.asarray(rng.randint(-127, 128, (B, H, W, C)), jnp.int8)
    wq = jnp.asarray(rng.randint(-127, 128, (3, 3, C, CO)), jnp.int8)
    a = jnp.asarray(rng.rand(CO).astype(np.float32) * 0.01)
    b = jnp.asarray(rng.randn(CO).astype(np.float32) * 0.1)
    inv = jnp.asarray((rng.rand(CO).astype(np.float32) + 0.5) * 50)
    return xq, wq, a, b, inv


def _oracle(xq, wq, a, b, inv, relu, requant):
    xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)),
                 constant_values=np.int8(-127))
    acc = jax.lax.conv_general_dilated(
        xp, wq, (1, 1), ((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    z = acc.astype(jnp.float32) * a + b
    if relu:
        z = jnp.maximum(z, 0.0)
    if requant:
        return (jnp.clip(jnp.round(z * inv), 0, 254) - 127).astype(jnp.int8)
    return z.astype(jnp.bfloat16)


@pytest.mark.parametrize("seed", [0, 1])
def test_bf16_output_matches_oracle_exactly(seed):
    xq, wq, a, b, inv = _case(seed)
    got = int8_conv3x3s1p1(xq, wq, a, b, None, relu=True, interpret=True)
    want = _oracle(xq, wq, a, b, inv, relu=True, requant=False)
    assert got.dtype == jnp.bfloat16
    assert bool(jnp.all(got == want))


def test_s8_requantized_output_matches_oracle_exactly():
    xq, wq, a, b, inv = _case(2)
    got = int8_conv3x3s1p1(xq, wq, a, b, inv, relu=True, interpret=True)
    want = _oracle(xq, wq, a, b, inv, relu=True, requant=True)
    assert got.dtype == jnp.int8
    assert int(jnp.sum(got != want)) == 0


def test_no_relu_bf16_path():
    xq, wq, a, b, inv = _case(3, C=128, CO=64)
    got = int8_conv3x3s1p1(xq, wq, a, b, None, relu=False, interpret=True)
    want = _oracle(xq, wq, a, b, inv, relu=False, requant=False)
    assert bool(jnp.all(got == want))


def test_requant_without_relu_raises():
    xq, wq, a, b, inv = _case(4)
    with pytest.raises(ValueError):
        int8_conv3x3s1p1(xq, wq, a, b, inv, relu=False, interpret=True)
