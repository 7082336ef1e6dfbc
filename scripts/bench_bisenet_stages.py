"""Stage-level timing of the BiSeNet-R18 eval forward at 1024x512, batch 4.

Times each architectural stage in isolation with the compiled-loop ring
protocol (PERFORMANCE.md), using enough iterations that the ~30 ms axon
transport RTT (measured: the 'overhead' column of bench_conv_marginal.py is
RTT/ITERS, not per-iteration work) stays under 5% of each figure.

Run on TPU:  python scripts/bench_bisenet_stages.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from rtda_semanticsegmentation_tpu.config import ExperimentConfig
from rtda_semanticsegmentation_tpu.models.factory import build_model, init_model

H, W, B = 512, 1024, 4
ITERS = 200
RING = 2


def time_fn(fn, *args):
    """Compiled-loop ring timing; fn(x) -> array, x from ring."""

    @jax.jit
    def loop(ring, n):
        def body(i, acc):
            x = jax.lax.dynamic_index_in_dim(ring, i % RING, keepdims=False)
            return acc + jnp.sum(fn(x).astype(jnp.float32))

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    ring = args[0]
    float(loop(ring, 5))
    t0 = time.perf_counter()
    float(loop(ring, ITERS))
    return (time.perf_counter() - t0) / ITERS


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)
    cfg = ExperimentConfig()
    model = build_model(cfg.model)
    variables = init_model(model, jax.random.PRNGKey(0), (1, H, W, 3), train=False)
    rng = np.random.RandomState(0)

    def ring_of(shape, dtype=jnp.bfloat16):
        return jnp.asarray(rng.randn(RING, *shape), dtype)

    # Bind submodules for isolated application.
    import flax.linen as nn

    from rtda_semanticsegmentation_tpu.models.bisenet import (
        AttentionRefinementModule,
        FeatureFusionModule,
        SpatialPath,
    )
    from rtda_semanticsegmentation_tpu.models.layers import (
        max_pool_torch,
        resize_bilinear,
    )
    from rtda_semanticsegmentation_tpu.models.resnet import BasicBlock, ConvBN

    p = variables["params"]
    bs = variables["batch_stats"]
    rn = p["context_path"]["resnet"]
    rn_bs = bs["context_path"]["resnet"]

    results = {}

    # Full forward
    full = time_fn(
        lambda x: model.apply(variables, x, False), ring_of((B, H, W, 3))
    )
    results["FULL forward"] = full

    # Spatial path (3 -> 64 -> 128 -> 256, stride 2 each)
    sp = SpatialPath(dtype=jnp.bfloat16)
    spv = {
        "params": p["spatial_path"],
        "batch_stats": bs["spatial_path"],
    }
    results["spatial_path"] = time_fn(
        lambda x: sp.apply(spv, x, False), ring_of((B, H, W, 3))
    )

    # Stem (7x7/2) + maxpool
    stem = ConvBN(64, (7, 7), (2, 2), padding=((3, 3), (3, 3)), dtype=jnp.bfloat16)
    stemv = {"params": rn["stem"], "batch_stats": rn_bs["stem"]}
    results["stem 7x7/2"] = time_fn(
        lambda x: stem.apply(stemv, x, False), ring_of((B, H, W, 3))
    )
    results["stem+pool"] = time_fn(
        lambda x: max_pool_torch(stem.apply(stemv, x, False), 3, 2, 1),
        ring_of((B, H, W, 3)),
    )

    # ResNet stages (each: 2 BasicBlocks)
    stage_shapes = {
        1: ((B, H // 4, W // 4, 64), 64, 1),
        2: ((B, H // 4, W // 4, 64), 128, 2),
        3: ((B, H // 8, W // 8, 128), 256, 2),
        4: ((B, H // 16, W // 16, 256), 512, 2),
    }
    for stage, (in_shape, filt, stride) in stage_shapes.items():
        def stage_fn(x, stage=stage, filt=filt, stride=stride):
            for i in range(2):
                blk = BasicBlock(filt, stride if i == 0 else 1, dtype=jnp.bfloat16)
                v = {
                    "params": rn[f"layer{stage}_{i}"],
                    "batch_stats": rn_bs[f"layer{stage}_{i}"],
                }
                x = blk.apply(v, x, False)
            return x

        results[f"layer{stage}"] = time_fn(stage_fn, ring_of(in_shape))

    # ARMs + tail multiply
    arm1 = AttentionRefinementModule(256, dtype=jnp.bfloat16)
    arm1v = {"params": p["arm1"], "batch_stats": bs["arm1"]}
    results["arm1 (1/16)"] = time_fn(
        lambda x: arm1.apply(arm1v, x, False), ring_of((B, H // 16, W // 16, 256))
    )
    arm2 = AttentionRefinementModule(512, dtype=jnp.bfloat16)
    arm2v = {"params": p["arm2"], "batch_stats": bs["arm2"]}
    results["arm2 (1/32)"] = time_fn(
        lambda x: arm2.apply(arm2v, x, False), ring_of((B, H // 32, W // 32, 512))
    )

    # Context upsamples to 1/8 + concat
    def ctx_up(cx1):
        cx1u = resize_bilinear(cx1, (H // 8, W // 8))
        return cx1u

    results["cx1 up x2"] = time_fn(ctx_up, ring_of((B, H // 16, W // 16, 256)))
    results["cx2 up x4"] = time_fn(
        lambda x: resize_bilinear(x, (H // 8, W // 8)),
        ring_of((B, H // 32, W // 32, 512)),
    )

    # FFM (concat 256 spatial + 768 context)
    ffm = FeatureFusionModule(19, dtype=jnp.bfloat16)
    ffmv = {"params": p["ffm"], "batch_stats": bs["ffm"]}

    def ffm_fn(x):
        sx = x[..., :256]
        cx = x[..., 256:]
        return ffm.apply(ffmv, sx, cx, False)

    results["ffm"] = time_fn(ffm_fn, ring_of((B, H // 8, W // 8, 1024)))

    # Head: x8 upsample + final 1x1 conv (as in model)
    fc = p["final_conv"]

    def head_now(x):
        y = resize_bilinear(x, (H, W))
        y = (
            jnp.einsum("bhwc,cd->bhwd", y.astype(jnp.bfloat16), fc["kernel"][0, 0].astype(jnp.bfloat16))
            + fc["bias"].astype(jnp.bfloat16)
        )
        return y

    def head_commuted(x):
        y = (
            jnp.einsum("bhwc,cd->bhwd", x, fc["kernel"][0, 0].astype(jnp.bfloat16))
            + fc["bias"].astype(jnp.bfloat16)
        )
        return resize_bilinear(y, (H, W))

    results["head: up x8 then 1x1"] = time_fn(head_now, ring_of((B, H // 8, W // 8, 19)))
    results["head: 1x1 then up x8"] = time_fn(
        head_commuted, ring_of((B, H // 8, W // 8, 19))
    )

    # --- new vs old compute paths (s2d stems, fast maxpool) ---
    sp_slow = SpatialPath(dtype=jnp.bfloat16, phase=0)
    results["spatial_path phase=0"] = time_fn(
        lambda x: sp_slow.apply(spv, x, False), ring_of((B, H, W, 3))
    )
    sp_fast = SpatialPath(dtype=jnp.bfloat16, phase=4)
    results["spatial_path phase=4"] = time_fn(
        lambda x: sp_fast.apply(spv, x, False), ring_of((B, H, W, 3))
    )
    stem_fast = ConvBN(
        64, (7, 7), (2, 2), padding=((3, 3), (3, 3)), dtype=jnp.bfloat16,
        phase_factor=4,
    )
    results["stem phase=4"] = time_fn(
        lambda x: stem_fast.apply(stemv, x, False), ring_of((B, H, W, 3))
    )
    results["maxpool only (new)"] = time_fn(
        lambda x: max_pool_torch(x, 3, 2, 1), ring_of((B, H // 2, W // 2, 64))
    )

    # Stage sum for the attribution check: exactly the stages the current
    # model executes once each — exclude the FULL row, the A/B variant rows,
    # the standalone stem/pool rows (stem+pool covers them), and the OLD
    # head order (the model does 1x1-then-up).
    in_sum = {
        "spatial_path", "stem+pool", "layer1", "layer2", "layer3", "layer4",
        "arm1 (1/16)", "arm2 (1/32)", "cx1 up x2", "cx2 up x4", "ffm",
        "head: 1x1 then up x8",
    }
    total = sum(v for k, v in results.items() if k in in_sum)
    for k, v in results.items():
        print(f"{k:24s}: {v * 1e3:7.3f} ms", file=sys.stderr)
    print(f"{'sum of stages':24s}: {total * 1e3:7.3f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
