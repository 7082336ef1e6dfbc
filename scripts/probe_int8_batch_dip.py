"""Root-cause probe for the int8 batch-160/192 throughput dip (round 5).

The r4-policy int8 frozen sweep read 1694 @ b128, then 1363 / 1491 @
b160/192 before recovering to 1735 @ b256 (PERFORMANCE.md headline notes)
— recorded as "consistent with an XLA tiling/layout resonance away from
128-multiples; observed, not root-caused". This probe answers two
questions under the CURRENT default policy (quant_min_ch=128):

1. Does the dip persist? Sweep frozen-int8 serve throughput at
   b96..b256 (finer grid around 160/192), with bf16 controls at the same
   batches — if bf16 dips too, the cause is not int8-specific.
2. If it persists, WHERE is the time? Per-batch normalized ms/img for
   the probe batches, plus an optimized-HLO category diff (fusion /
   convolution / copy instruction counts) between a dip batch and its
   well-behaved neighbors: a resonance that changes program STRUCTURE
   shows up as different op counts; one that only changes tile
   efficiency shows identical programs with slower convs.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_int8_batch_dip.py
"""

from __future__ import annotations

import dataclasses
import re
import sys
import time
from collections import Counter

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import bench  # repo-root bench.py: reuse its builders and protocol

BATCHES = (96, 128, 144, 160, 176, 192, 224, 256)
HLO_BATCHES = (128, 160, 256)


def _hlo_categories(fwd, v, batch: int) -> Counter:
    imgs = jnp.zeros((batch, bench.H, bench.W, 3), jnp.uint8)
    txt = jax.jit(fwd).lower(v, imgs).compile().as_text()
    cats: Counter = Counter()
    for line in txt.splitlines():
        m = re.match(r"\s*(?:ROOT )?%?[\w.-]+ = \S+ (\w+)\(", line)
        if m:
            cats[m.group(1)] += 1
    return cats


def main() -> None:
    from rtda_semanticsegmentation_tpu.config import ExperimentConfig
    from rtda_semanticsegmentation_tpu.models.quantize import (
        calibrate,
        freeze,
        quantized_model,
    )
    from rtda_semanticsegmentation_tpu.ops.augment import normalize_u8

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)

    variables, bf16_forward = bench._build()
    t0 = time.perf_counter()
    _, _, _, trained = bench._train_throughput("vanilla", 8)
    print(f"[{time.perf_counter()-t0:.0f}s] trained weights ready", flush=True)

    cfg0 = ExperimentConfig()
    rng = np.random.RandomState(7)
    calib_batches = [
        normalize_u8(
            jnp.asarray(bench._learnable_batch(rng, 4, bench.H, bench.W)[0]),
            cfg0.augment,
        ).astype(jnp.bfloat16)
        for _ in range(3)
    ]
    v = calibrate(cfg0.model, trained, calib_batches)
    v = freeze(cfg0.model, v)
    mq = quantized_model(cfg0.model, frozen=True)

    @jax.jit
    def int8_fwd(v, images):
        x = normalize_u8(images, cfg0.augment).astype(jnp.bfloat16)
        return mq.apply(v, x, False)

    print(f"{'batch':>6} {'int8 img/s':>11} {'ms/img':>7} "
          f"{'bf16 img/s':>11} {'ms/img':>7}", flush=True)
    rows = {}
    for b in BATCHES:
        sec_q, _ = bench._time_batch(int8_fwd, v, b)
        sec_f, _ = bench._time_batch(bf16_forward, trained, b)
        rows[b] = (b / sec_q, b / sec_f)
        print(f"{b:>6} {b/sec_q:>11.1f} {sec_q/b*1e3:>7.3f} "
              f"{b/sec_f:>11.1f} {sec_f/b*1e3:>7.3f}", flush=True)

    # Structural check: does the program change shape at the dip batches?
    base = None
    for b in HLO_BATCHES:
        cats = _hlo_categories(int8_fwd, v, b)
        total = sum(cats.values())
        top = ", ".join(f"{k}={n}" for k, n in cats.most_common(8))
        print(f"HLO b{b}: {total} instructions ({top})", flush=True)
        if base is None:
            base = (b, cats)
        else:
            diff = {
                k: cats.get(k, 0) - base[1].get(k, 0)
                for k in set(cats) | set(base[1])
                if cats.get(k, 0) != base[1].get(k, 0)
            }
            print(f"  diff vs b{base[0]}: {diff if diff else 'IDENTICAL op counts'}",
                  flush=True)


if __name__ == "__main__":
    main()
