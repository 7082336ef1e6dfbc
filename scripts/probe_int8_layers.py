"""Per-group int8 sensitivity: which convs cost argmax fidelity?

Leave-group-out on the bench gate's exact setup (23-step learnable-trained
BiSeNet weights, per-input-channel activation scales): for each candidate
``quant_skip`` group, calibrate + quantize everything EXCEPT that group and
measure held-out argmax agreement vs the bf16 forward. A group whose
exclusion recovers agreement is an offender — quantization noise there
survives to the logits. Also sweeps the clip quantile at the baseline,
since per-channel scales change the outlier economics the round-2 global
clip was tuned for.

Findings go to PERFORMANCE.md (int8 section) and set the production
``ModelConfig.quant_skip`` default.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_int8_layers.py
"""

import dataclasses
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

SKIPS = [
    (),
    ("ffm",),
    ("layer4",),
    ("layer3",),
    ("layer2",),
    ("layer1",),
    ("spatial_path",),
    # combos refined from the singles above
    ("ffm", "layer4"),
    ("ffm", "layer4", "layer3"),
    ("ffm", "spatial_path"),
]
CLIPS = (1.0, 0.9999, 0.999)


def main() -> None:
    import bench
    from rtda_semanticsegmentation_tpu.config import ExperimentConfig
    from rtda_semanticsegmentation_tpu.models.factory import build_model
    from rtda_semanticsegmentation_tpu.models.quantize import (
        calibrate,
        quantized_model,
    )
    from rtda_semanticsegmentation_tpu.ops.augment import normalize_u8

    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)
    _, _, _, trained_vars = bench._train_throughput("vanilla", 8)
    base = ExperimentConfig()
    model = build_model(base.model)

    H, W = bench.H, bench.W

    def batches():
        """Same draw protocol as bench._build_int8: RandomState(7), 3 calib
        batches then a held-out probe."""
        rng = np.random.RandomState(7)

        def u8():
            return jnp.asarray(bench._learnable_batch(rng, 4, H, W)[0])

        calib = [
            normalize_u8(u8(), base.augment).astype(jnp.bfloat16)
            for _ in range(3)
        ]
        probe = normalize_u8(u8(), base.augment).astype(jnp.bfloat16)
        return calib, probe

    calib_b, probe = batches()
    ref = jnp.argmax(model.apply(trained_vars, probe, False), -1)
    ref.block_until_ready()

    def agreement(mcfg):
        v = calibrate(mcfg, dict(trained_vars), calib_b)
        mq = quantized_model(mcfg)
        got = jnp.argmax(mq.apply(v, probe, False), -1)
        return float(jnp.mean(ref == got))

    print("== clip sweep (no skips, per-channel scales) ==")
    for clip in CLIPS:
        mcfg = dataclasses.replace(base.model, quant_clip=clip)
        print(f"clip={clip}: agreement {agreement(mcfg):.4f}", flush=True)

    print("== leave-group-out (clip=0.999) ==")
    for skip in SKIPS:
        mcfg = dataclasses.replace(base.model, quant_skip=skip)
        print(f"skip={skip!r}: agreement {agreement(mcfg):.4f}", flush=True)


if __name__ == "__main__":
    main()
