"""Epoch-scale A/B of THIS framework against the ACTUAL reference code.

The BASELINE target is trajectory-scale equivalence ("reference UDA mIoU
within 0.5 pts", reference ``validation.py:135-136``). One-step f64 parity
(tests/test_train_parity.py) bounds a single update; this harness bounds the
*compounded* dynamics (BN running stats x Adam moments x poly-LR x loss
composition) by running the reference's own orchestrators
(``/root/reference/main.py`` / ``main_adversarial.py``, torch CPU) and our
CLI from bit-identical initial weights on identical on-disk fixtures, then
comparing per-epoch validation loss / mIoU trajectories.

Design for determinism (no RNG enters either side):

- the fixture set size equals the batch size -> exactly one batch per epoch,
  so DataLoader shuffle order is irrelevant (batch-permutation-invariant
  math on both sides);
- the ``no_new_aug`` pipeline (Resize -> Normalize -> ToTensor) with
  fixtures written at the target size -> every Resize is the identity;
- ``lovasz_impl='sort'`` on our side (the exact reference formulation).

Fixtures are *learnable*: labels are piecewise-constant class maps and
images are the class palette color + mild deterministic noise, so mIoU
climbs well above chance within a few epochs and the comparison exercises
real convergence, not noise.

Usage (CPU, ~10-25 min warm for all four modes)::

    python scripts/ab_reference.py --modes vanilla lovasz \
        --epochs 10 --out /tmp/ab_reference

Results: per-epoch table per mode + JSON at ``<out>/ab_results.json``.
``tests/test_ab_reference.py`` (slow tier) runs the vanilla mode and
asserts the tolerances; PARITY.md records a full 4-mode run.
"""

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHIMS = os.path.join(REPO, "scripts", "ab_shims")

# 19-class palette: maximally-spread RGB anchors (NOT the Cityscapes
# colors — the fixtures are synthetic; any injective class->color map works)
_PALETTE = np.stack(
    np.meshgrid([32, 112, 192], [32, 112, 192], [16, 128, 240], indexing="ij"),
    axis=-1,
).reshape(-1, 3)[:19].astype(np.uint8)


def _label_map(rng, h, w, cells=8):
    """Piecewise-constant class map: random class per coarse grid cell."""
    gh, gw = max(1, h // cells), max(1, w // cells)
    grid = rng.integers(0, 19, size=(gh, gw))
    lab = np.repeat(np.repeat(grid, cells, 0), cells, 1)[:h, :w]
    out = np.full((h, w), 255, np.uint8)
    out[: lab.shape[0], : lab.shape[1]] = lab.astype(np.uint8)
    # an ignore stripe exercises the 255 masking on both sides
    out[-3:, :] = 255
    return out


def _image_for(rng, label):
    img = _PALETTE[np.where(label == 255, 0, label)].astype(np.int16)
    img = img + rng.integers(-12, 13, size=img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def make_fixtures(root, n, h, w, seed=7):
    from PIL import Image

    rng = np.random.default_rng(seed)
    gta = os.path.join(root, "GTA5")
    cs = os.path.join(root, "Cityscapes")
    os.makedirs(os.path.join(gta, "images"), exist_ok=True)
    os.makedirs(os.path.join(gta, "labels_trainids"), exist_ok=True)
    for i in range(n):
        lab = _label_map(rng, h, w)
        Image.fromarray(_image_for(rng, lab)).save(
            os.path.join(gta, "images", f"{i:05d}.png")
        )
        Image.fromarray(lab, mode="L").save(
            os.path.join(gta, "labels_trainids", f"{i:05d}.png")
        )
    for split in ("train", "val"):
        img_dir = os.path.join(cs, "images", split, "cityA")
        lab_dir = os.path.join(cs, "gtFine", split, "cityA")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(lab_dir, exist_ok=True)
        for i in range(n):
            lab = _label_map(rng, h, w)
            stem = f"cityA_{i:06d}_000019"
            Image.fromarray(_image_for(rng, lab)).save(
                os.path.join(img_dir, f"{stem}_leftImg8bit.png")
            )
            Image.fromarray(lab, mode="L").save(
                os.path.join(lab_dir, f"{stem}_gtFine_labelTrainIds.png")
            )
    return gta, cs


def _val_rows(jsonl_path):
    rows = []
    with open(jsonl_path) as f:
        for line in f:
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "val/mIoU" in obj:
                rows.append(
                    {"miou": obj["val/mIoU"], "loss": obj["val/epoch_loss"]}
                )
    return rows


def run_mode(mode, out, gta, cs, init_dir, epochs, batch, h, w, env):
    ref_dir = os.path.join(out, f"ref_{mode}")
    os.makedirs(ref_dir, exist_ok=True)
    ref_jsonl = os.path.join(ref_dir, "wandb.jsonl")
    open(ref_jsonl, "w").close()
    init_ckpt = os.path.join(
        init_dir,
        "init_adversarial.pth" if "adversarial" in mode else "init_vanilla.pth",
    )
    print(f"[{mode}] reference orchestrator ...", flush=True)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "_ab_run_reference.py"),
         "--mode", mode, "--gta5", gta, "--cityscapes", cs,
         "--epochs", str(epochs), "--batch_size", str(batch),
         "--height", str(h), "--width", str(w), "--resume", init_ckpt,
         "--shims", SHIMS],
        cwd=ref_dir, env={**env, "AB_WANDB_JSONL": ref_jsonl}, check=True,
    )

    ours_logs = os.path.join(out, f"ours_{mode}")
    print(f"[{mode}] our trainer (jax cpu) ...", flush=True)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "_ab_run_ours.py"),
         "--mode", mode, "--gta5", gta, "--cityscapes", cs,
         "--epochs", str(epochs), "--batch_size", str(batch),
         "--height", str(h), "--width", str(w),
         "--init_g", os.path.join(init_dir, "init_g.npz"),
         "--init_d", os.path.join(init_dir, "init_d.npz"),
         "--log_dir", ours_logs,
         "--checkpoint_dir", os.path.join(ours_logs, "ckpt")],
        env=env, check=True,
    )

    ref = _val_rows(ref_jsonl)
    ours = _val_rows(os.path.join(ours_logs, f"{mode}.jsonl"))
    n = min(len(ref), len(ours))
    if n == 0:
        raise RuntimeError(
            f"[{mode}] no validation rows (ref={len(ref)}, ours={len(ours)})"
        )
    # the reference re-validates the reloaded best checkpoint after the
    # epoch loop through the same wandb keys; compare the first `epochs`
    # entries (epoch-aligned) only
    n = min(n, epochs)
    rows = []
    for e in range(n):
        rows.append({
            "epoch": e + 1,
            "ref_miou": ref[e]["miou"], "our_miou": ours[e]["miou"],
            "dmiou": abs(ref[e]["miou"] - ours[e]["miou"]),
            "ref_loss": ref[e]["loss"], "our_loss": ours[e]["loss"],
            "dloss_rel": abs(ref[e]["loss"] - ours[e]["loss"])
            / max(abs(ref[e]["loss"]), 1e-9),
        })
    return {
        "mode": mode,
        "epochs_compared": n,
        "rows": rows,
        "max_dmiou": max(r["dmiou"] for r in rows),
        "final_dmiou": rows[-1]["dmiou"],
        "max_dloss_rel": max(r["dloss_rel"] for r in rows),
        "ref_final_miou": rows[-1]["ref_miou"],
        "our_final_miou": rows[-1]["our_miou"],
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--modes", nargs="+", default=[
        "vanilla", "lovasz", "adversarial", "adversarial_lovasz"])
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--n_images", type=int, default=4,
                   help="fixture count per split == batch size (one batch "
                        "per epoch keeps both sides shuffle-independent)")
    p.add_argument("--size", type=int, nargs=2, default=(64, 128),
                   metavar=("H", "W"))
    p.add_argument("--out", default="/tmp/ab_reference")
    args = p.parse_args(argv)

    h, w = args.size
    os.makedirs(args.out, exist_ok=True)
    env = {k: v for k, v in os.environ.items() if k != "AB_WANDB_JSONL"}

    print("fixtures ...", flush=True)
    gta, cs = make_fixtures(os.path.join(args.out, "data"), args.n_images, h, w)

    init_dir = os.path.join(args.out, "init")
    print("shared init weights ...", flush=True)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "_ab_make_init.py"),
         "--out", init_dir, "--shims", SHIMS, "--repo", REPO],
        env=env, check=True,
    )

    results = []
    for mode in args.modes:
        res = run_mode(mode, args.out, gta, cs, init_dir, args.epochs,
                       args.n_images, h, w, env)
        results.append(res)
        print(f"\n=== {mode} ===")
        print(f"{'ep':>3} {'ref mIoU':>9} {'our mIoU':>9} {'|d|':>8} "
              f"{'ref loss':>9} {'our loss':>9} {'rel d':>8}")
        for r in res["rows"]:
            print(f"{r['epoch']:>3} {r['ref_miou']:>9.4f} "
                  f"{r['our_miou']:>9.4f} {r['dmiou']:>8.5f} "
                  f"{r['ref_loss']:>9.4f} {r['our_loss']:>9.4f} "
                  f"{r['dloss_rel']:>8.5f}")
        print(f"max |dmIoU| {res['max_dmiou']:.5f}  "
              f"final |dmIoU| {res['final_dmiou']:.5f}  "
              f"max rel dloss {res['max_dloss_rel']:.5f}")

    path = os.path.join(args.out, "ab_results.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"\nresults -> {path}")
    return results


if __name__ == "__main__":
    main()
