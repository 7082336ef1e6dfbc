"""FC-Discriminator for output-space adversarial adaptation (Tsai et al.).

NHWC re-design of reference ``models/discriminator/discriminator.py:5-85``:
five 4x4 stride-2 convs num_classes->64->128->256->512->1 with LeakyReLU(0.2)
between, weights ~ N(0, 0.02). Input is a softmax probability map
(B, H, W, num_classes); output is a patch logit map (B, H/32, W/32, 1).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .layers import Dtype, normal_init


class FCDiscriminator(nn.Module):
    num_classes: int = 19
    ndf: int = 64
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        widths = (self.ndf, self.ndf * 2, self.ndf * 4, self.ndf * 8)
        for i, ch in enumerate(widths):
            x = nn.Conv(
                ch, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                use_bias=True, dtype=self.dtype, param_dtype=jnp.float32,
                kernel_init=normal_init(0.02), name=f"conv{i + 1}",
            )(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
        x = nn.Conv(
            1, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)), use_bias=True,
            dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=normal_init(0.02), name="classifier",
        )(x)
        return x
