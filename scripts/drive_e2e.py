"""End-to-end consumer drive: adversarial training on the 8-device CPU mesh.

The /verify recipe (.claude/skills/verify/SKILL.md) executable: full
``run_experiment`` on the synthetic dataset over a data=8 mesh — exercises
loaders, aug, adversarial step, eval, checkpointing. Expected: CE falls
2.4 -> ~0.84 over 16 epochs; present-class IoUs > 0.5; loss_d ~= log 2.
Runtime ~18 min on the 1-core runner (compiles dominate).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/drive_e2e.py
"""
import os
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import dataclasses
import numpy as np

from rtda_semanticsegmentation_tpu.config import get_preset
from rtda_semanticsegmentation_tpu.train.loop import run_experiment

cfg = get_preset("bisenet_adversarial")
cfg = cfg.replace(
    model=dataclasses.replace(
        cfg.model, compute_dtype="float32", pretrained_backbone=None
    ),
    data=dataclasses.replace(
        cfg.data,
        train_dataset="synthetic",
        val_dataset="synthetic",
        adversarial_target_dataset="synthetic",
        adversarial_target_split="train",
        gta5_size=(64, 128),
        cityscapes_size=(64, 128),
        eval_batch_size=8,
        synthetic_length=32,
        num_workers=0,
    ),
    augment=dataclasses.replace(cfg.augment, pipeline="no_new_aug"),
    train=dataclasses.replace(
        cfg.train, batch_size=8, epochs=16, seed=0,
        checkpoint_dir="/tmp/drive/ckpt", validate_freq_epoch=8,
        print_freq_batch=8, save_checkpoint_freq_epoch=100,
        latency_iterations=0, warmup_iterations=0,
    ),
    mesh=dataclasses.replace(cfg.mesh, data=8, model=1),
    obs=dataclasses.replace(cfg.obs, backend="null", log_dir="/tmp/drive/logs"),
)
print("mesh devices:", len(jax.devices()), flush=True)
report = run_experiment(cfg, run_name="drive-e2e", measure_performance=False)
print("REPORT keys:", sorted(report.keys()))
for k, v in report.items():
    if isinstance(v, (int, float, str)):
        print(f"  {k}: {v}")
pci = report.get("best_per_class_iou")
if pci is not None:
    print("per-class iou (first 4 / present classes):", np.round(np.asarray(pci)[:4], 3))
