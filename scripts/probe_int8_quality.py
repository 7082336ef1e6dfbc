"""int8 PTQ quality probe: are the residual argmax flips quality-relevant?

The bench fidelity ladder (PERFORMANCE.md) took trained-weight argmax
agreement 0.921 -> 0.977 (per-channel scales, unsigned grid, exact-max
clip, bias correction), still short of the 0.99 pixel gate. This probe
asks the question that actually matters for serving: does int8 change the
TASK metric? It measures, on held-out labeled synthetic batches (same
distribution the probe weights were trained on):

- argmax agreement int8 vs bf16 (the current gate),
- mIoU of the bf16 path and of the int8 path against the TRUE labels,
  and their delta — BASELINE.md's own equivalence currency (0.5 pts),
- the bf16 top1-top2 logit margin at flipped vs unflipped pixels — if
  flips concentrate where the margin is ~0 (the x8 bilinear boundary
  ramps), they are sub-pixel boundary shifts, not misclassifications.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_int8_quality.py
"""

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    import bench
    from rtda_semanticsegmentation_tpu.ops.metrics import (
        confusion_matrix,
        per_class_iou_np,
    )

    print(f"device: {jax.devices()[0].device_kind}", file=sys.stderr)
    _, _, _, trained_vars = bench._train_throughput("vanilla", 8)

    variables, forward = bench._build()
    q_vars, q_forward, _probe, _labels, q_clip = bench._build_int8(trained_vars)

    # held-out labeled batches: fresh seed, never seen by training (seed 0)
    # or calibration (seed 7)
    rng = np.random.RandomState(11)
    hist_bf, hist_q = np.zeros((19, 19), np.int64), np.zeros((19, 19), np.int64)
    agree_n = agree_d = 0
    margins_flip, margins_all = [], []
    for _ in range(4):
        imgs, labels = bench._learnable_batch(rng, 4, bench.H, bench.W)
        imgs, labels = jnp.asarray(imgs), jnp.asarray(labels)
        logits = forward(q_vars, imgs).astype(jnp.float32)
        pred_bf = jnp.argmax(logits, -1)
        pred_q = jnp.argmax(q_forward(q_vars, imgs), -1)
        top2 = jax.lax.top_k(logits, 2)[0]
        margin = top2[..., 0] - top2[..., 1]
        flips = pred_bf != pred_q
        agree_n += int(jnp.sum(~flips))
        agree_d += flips.size
        margins_flip.append(np.asarray(margin[flips]))
        margins_all.append(np.asarray(margin).reshape(-1))
        hist_bf += np.asarray(confusion_matrix(labels, pred_bf, 19), np.int64)
        hist_q += np.asarray(confusion_matrix(labels, pred_q, 19), np.int64)

    agreement = agree_n / agree_d
    iou_bf = per_class_iou_np(hist_bf)
    iou_q = per_class_iou_np(hist_q)
    miou_bf = float(np.mean(iou_bf))
    miou_q = float(np.mean(iou_q))
    mf = np.concatenate(margins_flip)
    ma = np.concatenate(margins_all)
    print(f"argmax agreement (held out, 16 imgs): {agreement:.4f}")
    print(f"mIoU vs true labels: bf16 {miou_bf:.4f}  int8 {miou_q:.4f}  "
          f"delta {abs(miou_bf - miou_q) * 100:.3f} pts (clip={q_clip})")
    wpc = np.max(np.abs(iou_bf - iou_q))
    print(f"worst per-class |IoU delta|: {wpc * 100:.3f} pts")
    for q in (50, 90, 99):
        print(f"bf16 top1-top2 margin p{q}: flipped {np.percentile(mf, q):.4f} "
              f"vs all pixels {np.percentile(ma, q):.4f}")
    frac_low = float((mf < np.percentile(ma, 10)).mean())
    print(f"fraction of flips inside the lowest-margin decile of all "
          f"pixels: {frac_low:.3f}")


if __name__ == "__main__":
    main()
