"""CLI surface tests: flag parsing -> config, end-to-end subprocess smoke run,
debug visualizer output."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from rtda_semanticsegmentation_tpu.cli.common import args_to_config
from rtda_semanticsegmentation_tpu.cli.train import main as train_main

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def parse(argv, adversarial=False):
    import argparse

    from rtda_semanticsegmentation_tpu.cli.common import add_common_flags

    p = argparse.ArgumentParser()
    add_common_flags(p, adversarial)
    return args_to_config(p.parse_args(argv), adversarial)


def test_flags_override_config():
    cfg = parse(
        [
            "--model_name", "deeplabv2", "--optimizer", "sgd", "--epochs", "7",
            "--gta5_dataset_path", "/x/gta", "--augmentation", "hflip_only",
            "--use_lovasz", "--mesh_data", "2",
        ]
    )
    assert cfg.model.name == "deeplabv2"
    assert cfg.optimizer.name == "sgd"
    # picking sgd without --lr uses sgd's default LR (reference config.py:86-95)
    assert cfg.optimizer.learning_rate == 2.5e-4
    assert cfg.train.epochs == 7
    assert cfg.data.gta5_path == "/x/gta"
    assert cfg.augment.pipeline == "hflip_only"
    assert cfg.loss.use_lovasz is True
    assert cfg.mesh.data == 2


def test_adversarial_flag_names_and_enable():
    cfg = parse(
        ["--generator_model", "bisenet", "--generator_lr", "3e-4",
         "--gta5_path", "/g", "--cityscapes_path", "/c"],
        adversarial=True,
    )
    assert cfg.adversarial.enabled
    assert cfg.optimizer.learning_rate == 3e-4
    assert cfg.data.cityscapes_path == "/c"


def test_preset_plus_override():
    cfg = parse(["--preset", "bisenet_adversarial_lovasz", "--epochs", "3"])
    assert cfg.adversarial.enabled and cfg.loss.use_lovasz
    assert cfg.train.epochs == 3


def test_train_cli_end_to_end(tmp_path):
    """The real CLI entry, in-process, tiny synthetic run."""
    report = train_main(
        [
            "--preset", "bisenet_source_small",
            "--train_dataset", "synthetic", "--val_dataset", "synthetic",
            "--epochs", "1", "--steps_per_epoch", "2", "--batch_size", "4",
            "--mesh_data", "4", "--compute_dtype", "float32",
            "--checkpoint_dir", str(tmp_path / "ckpt"),
            "--log_backend", "jsonl", "--run_name", "cli_smoke",
            "--log_dir", str(tmp_path / "logs"),
            "--no_perf", "--eval_batch_size", "4",
        ]
    )
    assert report["global_step"] == 2


def test_debug_dataset_cli(tmp_path):
    from rtda_semanticsegmentation_tpu.cli.debug_dataset import main as dbg

    out = tmp_path / "panel.png"
    dbg(["--dataset", "synthetic", "--height", "32", "--width", "48",
         "--output", str(out)])
    from PIL import Image

    panel = np.asarray(Image.open(out))
    assert panel.shape == (32, 48 * 3, 3)


def test_loop_frequency_flags():
    """The reference's loop-frequency knobs (config.py:58,106-108) are
    CLI-overridable here."""
    cfg = parse([
        "--validate_freq_epoch", "3", "--save_checkpoint_freq_epoch", "7",
        "--log_images_freq_epoch", "4", "--print_freq_batch", "25",
    ])
    assert cfg.train.validate_freq_epoch == 3
    assert cfg.train.save_checkpoint_freq_epoch == 7
    assert cfg.train.log_images_freq_epoch == 4
    assert cfg.train.print_freq_batch == 25
    # defaults preserved when not passed
    cfg = parse([])
    assert cfg.train.validate_freq_epoch == 1
    assert cfg.train.save_checkpoint_freq_epoch == 5
    assert cfg.train.log_images_freq_epoch == 10
    assert cfg.train.print_freq_batch == 100


def test_num_workers_flag_and_auto_default():
    import os

    cfg = parse(["--num_workers", "3"])
    assert cfg.data.num_workers == 3
    assert cfg.data.resolved_num_workers() == 3

    cfg = parse([])
    assert cfg.data.num_workers == -1  # auto
    assert cfg.data.resolved_num_workers() == min(32, os.cpu_count() or 1)


def test_num_workers_zero_is_minimal():
    # torch-DataLoader convention: 0 = in-process loading -> 1 thread here
    cfg = parse(["--num_workers", "0"])
    assert cfg.data.resolved_num_workers() == 1


def test_halt_on_nonfinite_flag():
    assert parse([]).train.halt_on_nonfinite is True
    assert parse(["--no_halt_on_nonfinite"]).train.halt_on_nonfinite is False


def test_disc_downsample_flag_adversarial_only():
    cfg = parse(["--disc_downsample", "8"], adversarial=True)
    assert cfg.adversarial.disc_downsample == 8
    assert parse([], adversarial=True).adversarial.disc_downsample == 1
    with pytest.raises(SystemExit):
        parse(["--disc_downsample", "8"])  # vanilla CLI: unknown flag


def test_decoded_cache_dir_flag():
    assert parse([]).data.decoded_cache_dir is None
    cfg = parse(["--decoded_cache_dir", "/fast/cache"])
    assert cfg.data.decoded_cache_dir == "/fast/cache"


def test_pretrained_discriminator_flag_adversarial_only():
    cfg = parse(["--pretrained_discriminator", "/w/d.npz"], adversarial=True)
    assert cfg.adversarial.pretrained_discriminator == "/w/d.npz"
    assert parse([], adversarial=True).adversarial.pretrained_discriminator is None
    with pytest.raises(SystemExit):
        parse(["--pretrained_discriminator", "/w/d.npz"])
