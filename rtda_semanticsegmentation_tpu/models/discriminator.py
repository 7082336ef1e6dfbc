"""FC-Discriminator for output-space adversarial adaptation (Tsai et al.).

NHWC re-design of reference ``models/discriminator/discriminator.py:5-85``:
five 4x4 stride-2 convs num_classes->64->128->256->512->1 with LeakyReLU(0.2)
between, weights ~ N(0, 0.02). Input is a softmax probability map
(B, H, W, num_classes); output is a patch logit map (B, H/32, W/32, 1).

The first conv (19 input channels at full resolution) is the one conv
XLA's v5e emitter runs ~3x off roofline (PERFORMANCE.md); on TPU it
dispatches to the fused-im2col Pallas kernel (``ops/pallas_conv.py``) with
identical parameter names/shapes, so checkpoints and weight converters are
unaffected. Elsewhere (CPU tests, interpret-unfriendly shapes) it falls
back to ``nn.Conv`` math via ``lax.conv``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import Dtype, normal_init


class _Conv4x4s2(nn.Module):
    """4x4/stride-2/pad-1 conv with a Pallas fused-im2col TPU path.

    Parameter tree matches ``nn.Conv`` (kernel HWIO + bias) exactly. With a
    ``mesh`` the Pallas call runs per batch shard under shard_map — a bare
    pallas_call under the SPMD partitioner would be replicated (all chips
    all-gather and redo the full batch).
    """

    features: int
    dtype: Dtype = jnp.bfloat16
    use_pallas: bool = True
    mesh: object = None
    data_axis: str = "data"

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            normal_init(0.02),
            (4, 4, x.shape[-1], self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        h, w = x.shape[1], x.shape[2]
        from ..ops.losses import _use_pallas

        use_pallas, interpret = _use_pallas()
        # On a multi-shard data axis the Pallas call is ONLY safe under
        # shard_map (an unsharded pallas_call makes the SPMD partitioner
        # all-gather the full batch onto every chip and replicate the whole
        # conv). If the batch can't be shard_mapped (not divisible — e.g. a
        # batch-1 init/probe call), fall through to lax.conv, which XLA can
        # shard, rather than running the replicated-gather pathology.
        shardable = (
            self.mesh is None
            or self.mesh.shape[self.data_axis] == 1
            or x.shape[0] % self.mesh.shape[self.data_axis] == 0
        )
        if (
            self.use_pallas
            and use_pallas
            and shardable
            and h % 2 == 0
            and w % 2 == 0
        ):
            from ..ops.pallas_conv import fused_conv4x4s2p1

            def conv(xb, k):
                return fused_conv4x4s2p1(
                    xb.astype(self.dtype), k, 32, 8, jnp.dtype(self.dtype),
                    interpret,
                )

            if (
                self.mesh is not None
                and self.mesh.shape[self.data_axis] > 1
            ):
                from jax.sharding import PartitionSpec as P

                conv = jax.shard_map(
                    conv,
                    mesh=self.mesh,
                    in_specs=(P(self.data_axis), P()),
                    out_specs=P(self.data_axis),
                    check_vma=False,  # pallas outputs carry no vma info
                )
            y = conv(x, kernel)
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                (2, 2),
                ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        return y + bias.astype(y.dtype)


class FCDiscriminator(nn.Module):
    num_classes: int = 19
    ndf: int = 64
    dtype: Dtype = jnp.bfloat16
    # Opt-in Pallas fused conv1. Measured on v5e: the fused-im2col kernel
    # LOSES to the native emitter (8.4 vs 4.8 ms fwd; dW 9.2 vs 6.1; dx
    # ties) — every formulation pays sub-128-lane copies for the 38-wide
    # packed channels (PERFORMANCE.md). Kept as tested machinery for
    # future layouts; OFF by default.
    fused_conv1: bool = False
    # Set when data-parallel so the Pallas conv shards over the batch.
    mesh: object = None
    data_axis: str = "data"

    @nn.compact
    def __call__(self, x):
        widths = (self.ndf, self.ndf * 2, self.ndf * 4, self.ndf * 8)
        for i, ch in enumerate(widths):
            if i == 0:
                x = _Conv4x4s2(
                    ch,
                    dtype=self.dtype,
                    use_pallas=self.fused_conv1,
                    mesh=self.mesh,
                    data_axis=self.data_axis,
                    name=f"conv{i + 1}",
                )(x)
            else:
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
