"""Immutable experiment configuration.

The reference keeps every knob in a single mutable module (`config.py`) that CLI
flags patch in place (reference ``config.py:1-292``, ``main.py:120-146``). Here
the same knob surface is expressed as frozen dataclasses composed into one
:class:`ExperimentConfig`; CLI overrides produce a *new* config via
:func:`dataclasses.replace`, and the five benchmark experiment presets of
``BASELINE.json`` are constructable by name through :func:`get_preset`.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple

# ---------------------------------------------------------------------------
# Leaf configs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class AugmentConfig:
    """Augmentation pipeline knobs.

    Mirrors the reference's albumentations pipeline matrix
    (reference ``config.py:115-265``): all stochastic augs fire with p=0.5,
    the active "all_four_combined" pipeline has HorizontalFlip commented out,
    so its effective order is ColorJitter -> ISONoise -> CoarseDropout.
    Our pipeline runs *on device*, batched, from uint8 NHWC images.
    """

    pipeline: str = "all_four_combined"
    # one of: no_new_aug | hflip_only | colorjitter_only | isonoise_only |
    #         coarsedropout_only | all_four_combined | all_four_plus_hflip
    prob: float = 0.5
    # ColorJitter(brightness=0.3, contrast=0.3, saturation=0.3, hue=0.1)
    cj_brightness: float = 0.3
    cj_contrast: float = 0.3
    cj_saturation: float = 0.3
    cj_hue: float = 0.1
    # ISONoise(intensity=(0.1, 0.3), color_shift=(0.01, 0.05))
    iso_intensity: Tuple[float, float] = (0.1, 0.3)
    iso_color_shift: Tuple[float, float] = (0.01, 0.05)
    # CoarseDropout(num_holes in [1, 8], hole hw in [20, 60] px, fill 0)
    cd_max_holes: int = 8
    cd_min_holes: int = 1
    cd_hole_size: Tuple[int, int] = (20, 60)
    cd_fill: float = 0.0
    # ImageNet normalization (reference config.py:128-130)
    norm_mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    norm_std: Tuple[float, float, float] = (0.229, 0.224, 0.225)
    # Storage dtype of the stochastic per-image chain inside augment_batch
    # (statistics reductions and ISONoise interiors stay f32 in every
    # mode). 'bfloat16' (default): the whole chain computes AND stores in
    # bf16 — measured fastest (same-session b32 aug deltas: bf16 14.6 ms,
    # uint8 22.6, f32 25.6 — scripts/bench_aug_dtype_ab.py, r5). 'uint8'
    # stores u8 between ops with per-op f32 math — the most
    # reference-faithful grid (albumentations transforms are u8-in/u8-out
    # with 1/255 steps, reference config.py:204-214) but SLOWER on TPU:
    # the per-op u8<->f32 conversions and 4-byte fusion interiors cost
    # more than the 1-byte barrier buffers save. 'float32' restores
    # bit-level headroom. Behavior note: each dtype is a different
    # numerical pipeline; fixed-seed draws differ across settings
    # (docs/MIGRATING.md).
    aug_dtype: str = "bfloat16"

    @property
    def flags(self) -> Tuple[bool, bool, bool, bool]:
        """(hflip, colorjitter, isonoise, coarsedropout) enabled switches."""
        p = self.pipeline
        return (
            p in ("hflip_only", "all_four_plus_hflip"),
            p in ("colorjitter_only", "all_four_combined", "all_four_plus_hflip"),
            p in ("isonoise_only", "all_four_combined", "all_four_plus_hflip"),
            p in ("coarsedropout_only", "all_four_combined", "all_four_plus_hflip"),
        )


@dataclass(frozen=True)
class DataConfig:
    """Dataset locations, sizes and loading (reference ``config.py:16-78``)."""

    train_dataset: str = "gta5"  # gta5 | cityscapes | synthetic
    val_dataset: str = "cityscapes"
    gta5_path: str = "./data/GTA5"
    cityscapes_path: str = "./data/Cityscapes"
    gta5_labels_subdir: str = "labels_trainids"
    gta5_convert_on_the_fly: bool = False
    gta5_size: Tuple[int, int] = (720, 1280)  # (H, W) train resize for GTA5
    cityscapes_size: Tuple[int, int] = (512, 1024)  # (H, W) for Cityscapes
    # Explicit overrides decoupling resolution from dataset identity (the
    # per-dataset sizes above mirror the reference's config.py:16-21):
    train_size_override: Optional[Tuple[int, int]] = None
    eval_size_override: Optional[Tuple[int, int]] = None
    # Host decode threads. -1 = auto-size to min(32, cpu_count): full-res
    # GTA5 PNG decode is ~84 ms/sample/thread (PERFORMANCE.md "Host data
    # path"), so feeding the 242 img/s vanilla train step needs ~21 threads
    # — the reference's fixed 16 worker processes (config.py:74) underfeeds
    # it and a fixed 8 would too. The native decode releases the GIL, so
    # threads scale with cores.
    num_workers: int = -1
    prefetch_batches: int = 2  # device prefetch depth
    eval_batch_size: int = 8  # reference validates at batch 1; we batch it
    # adversarial UDA streams (reference config.py:268-274)
    adversarial_source_dataset: str = "gta5"
    adversarial_target_dataset: str = "cityscapes"
    adversarial_target_split: str = "train"
    synthetic_length: int = 64  # samples in the synthetic dataset
    # Native C++ decode+resize fast path (data/native.py): 'auto' uses it
    # when the library builds, 'on' requires it, 'off' forces PIL. Both
    # paths are bit-identical (tests/test_native_data.py).
    native_decode: str = "auto"
    # Decoded-sample disk cache (data/cache.py): decode each PNG once, then
    # serve raw post-resize tensors (46x per sample vs full-res
    # PNG inflate — PERFORMANCE.md "Host data path"). Point it at fast
    # local storage; budget 6.5 MB/sample at 1280x720. None = off.
    decoded_cache_dir: Optional[str] = None

    def resolved_num_workers(self) -> int:
        if self.num_workers > 0:
            return self.num_workers
        if self.num_workers == 0:
            # torch-DataLoader convention: 0 = load in the caller's
            # process — here the minimal single decode thread.
            return 1
        import os

        return min(32, os.cpu_count() or 1)


@dataclass(frozen=True)
class ModelConfig:
    """Model family selection (reference ``config.py:31-43, 97-99``)."""

    name: str = "bisenet"  # bisenet | deeplabv2
    context_path: str = "resnet18"  # resnet18 | resnet101 (BiSeNet only)
    num_classes: int = 19
    compute_dtype: str = "bfloat16"  # bf16 on the MXU; f32 params
    # Evaluate the RGB-consuming stem convs in multi-phase coarse-stride form —
    # an exact kernel rearrangement (models/layers.py::conv_phase); parameter
    # trees are unchanged. Off by default: the full-model A/B
    # (scripts/bench_fast_input_ab.py) measured the native stems FASTER once
    # the head-conv reorder landed (970 vs 670 img/s at b16 on v5e).
    fast_input: bool = False
    pretrained_backbone: Optional[str] = None  # path to converted .npz weights
    disc_ndf: int = 64  # FCDiscriminator base width (reference discriminator.py:12)
    # int8 post-training quantization for the serving path ('none' | 'calib'
    # | 'int8' | 'freeze' | 'int8_frozen' — the last two are set internally
    # by models/quantize.py freeze()/quantized_model(frozen=True));
    # training always runs 'none'. Convs with >= quant_min_ch
    # input channels are quantized after a calibration pass
    # (models/quantize.py). v5e's MXU runs s8 at 2x the bf16 rate — but an
    # XLA int8 conv also materializes its raw s32 accumulator in HBM
    # (scripts/probe_int8_chain_hlo.py), so BANDWIDTH-bound convs lose:
    # at the 64-in-channel large-spatial shapes (layer1, spatial path)
    # int8 measures 2x SLOWER than bf16 per conv while >=128-channel
    # shapes win 1.5-1.9x (scripts/bench_pallas_int8_conv.py). The 128
    # default quantizes only where s8 pays; end-to-end policy sweep:
    # min_ch 128 = 1838 img/s vs 64's 1735 @ b256, with BETTER fidelity
    # (scripts/bench_int8_policy.py, r5).
    quant: str = "none"
    quant_min_ch: int = 128
    # Activation-scale clip quantile for calibration: 1.0 = exact per-channel
    # max|x| (the default); q < 1.0 clips to the q-quantile of |x|. With
    # per-INPUT-CHANNEL scales the exact max measures BEST on trained
    # weights (agreement 0.9720 @ 1.0 vs 0.9545 @ 0.999,
    # scripts/probe_int8_layers.py): the heavy tails quantile clipping
    # guarded against were cross-channel spread, which per-channel scales
    # already absorb. See ops/quant.py and PERFORMANCE.md int8 section.
    quant_clip: float = 1.0
    # Module-path substrings excluded from int8 (kept on the bf16 path even
    # in 'calib'/'int8' mode): matched against the bound flax path of each
    # ConvBN, e.g. ("ffm", "layer4"). Lever for trading throughput back for
    # argmax fidelity on quantization-sensitive (logits-adjacent) convs;
    # sensitivity ranking: scripts/probe_int8_layers.py.
    quant_skip: Tuple[str, ...] = ()


@dataclass(frozen=True)
class OptimizerConfig:
    """Generator optimizer (reference ``config.py:85-95``)."""

    name: str = "adam"  # sgd | adam
    learning_rate: float = 1e-4  # adam default; sgd default is 2.5e-4
    weight_decay: float = 1e-4
    sgd_momentum: float = 0.9
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    poly_power: float = 0.9  # poly LR decay exponent (reference config.py:83)

    @staticmethod
    def default_lr(name: str) -> float:
        return {"sgd": 2.5e-4, "adam": 1e-4}[name]


@dataclass(frozen=True)
class AdversarialConfig:
    """Single-level output-space adversarial UDA (reference ``config.py:268-287``)."""

    enabled: bool = False
    lambda_adv: float = 0.002  # generator adversarial loss weight
    # Block-average the generator LOGITS by this factor before the softmax
    # that feeds the discriminator (both the D step and G's adversarial
    # term). 1 = reference parity (full-resolution output-space softmax
    # maps, Tsai et al.; reference train.py:249-307). The FC-Discriminator's
    # 19-channel full-res conv1 resists every kernel-level rewrite
    # (PERFORMANCE.md "Known anomalies"); pooling shrinks D work ~factor^2
    # AND skips materializing the full-res f32 probability maps, while D —
    # fully convolutional — sees the same patch-level output-space domain
    # signal (softmax of block-mean logits). Requires train H, W divisible
    # by the factor. Measured: see PERFORMANCE.md "Discriminator input
    # downsampling".
    disc_downsample: int = 1
    # Warm-start the discriminator from a converted reference adversarial
    # checkpoint (.npz from `convert_torch_weights --model discriminator`).
    # Optimizer state does not transfer; pair with the generator's
    # --pretrained_backbone --full conversion for a full cross-framework
    # warm start.
    pretrained_discriminator: Optional[str] = None
    disc_optimizer: str = "adam"
    disc_learning_rate: float = 2.5e-5
    disc_adam_b1: float = 0.9
    disc_adam_b2: float = 0.99
    disc_weight_decay: float = 0.0


@dataclass(frozen=True)
class LossConfig:
    """Loss composition (reference ``config.py:63, 289-292``)."""

    ignore_index: int = 255
    use_lovasz: bool = False
    lovasz_weight: float = 0.5  # L = L_ce + w * L_lovasz
    # 'binned' = counting-sort formulation (TPU-fast, ~1e-3 of exact);
    # 'sort' = exact descending-sort parity with the reference.
    lovasz_impl: str = "binned"
    # FG/BG-split within-bucket backward for the binned Lovász (r5): the
    # exact per-rank coefficient is bimodal by fg-ness (fg step: 1/U; bg
    # step: I/U²) and bucket averaging mixes the two — the cause of the old
    # ~0.94 grad-cosine floor. The split backward evaluates each pixel's
    # own branch and measures grad cosine 0.99998-1.0000 vs the exact sort
    # at 256 bins (scripts/check_lovasz_bins_accuracy.py). False restores
    # the r4 bucket-average backward.
    lovasz_interp: bool = True
    # 256 bins: measured on v5e this is ~6% faster per flagship step than
    # 1024 (scripts/bench_deeplab_scaling_and_bins.py: 108.1 vs 114.7 ms)
    # while the accuracy study shows bin count barely moves fidelity —
    # max |loss delta| ~4e-5 and grad cosine 0.943 vs 0.945 at 1024
    # (scripts/check_lovasz_bins_accuracy.py; the cosine floor comes from
    # binning itself, not bucket width). Raise for parity studies.
    lovasz_bins: int = 256
    # Weight for BiSeNet's two aux-head CE losses (the BiSeNet paper uses
    # 1.0). Default 0.0 = reference parity: the reference computes the aux
    # heads but never feeds them to a loss (train.py:113-120), and XLA
    # dead-code-eliminates them at weight 0.
    aux_weight: float = 0.0


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh for SPMD execution.

    The reference is single-device (SURVEY.md section 2, "Parallelism").
    Here data parallelism is first-class: the train step is jitted over a
    ``Mesh((data, model))`` with the batch sharded on ``data``. The ``model``
    axis is a spare tensor-parallel axis (shards wide conv channels) so the
    mesh design scales beyond DP; ``model=1`` reproduces pure DP.
    """

    data: int = -1  # -1 => use all available devices
    model: int = 1
    data_axis_name: str = "data"
    model_axis_name: str = "model"


@dataclass(frozen=True)
class TrainConfig:
    """Loop-level knobs (reference ``config.py:7, 46-58, 80-83, 106-113``)."""

    seed: int = 42
    epochs: int = 50
    batch_size: int = 8  # global batch (sharded over the data axis)
    checkpoint_dir: str = "./checkpoints"
    best_checkpoint_name: str = "best_miou"
    periodic_checkpoint_name: str = "latest"
    save_checkpoint_freq_epoch: int = 5
    resume_checkpoint: Optional[str] = None
    validate_freq_epoch: int = 1
    print_freq_batch: int = 100
    log_images_freq_epoch: int = 10
    latency_iterations: int = 100
    warmup_iterations: int = 10
    remat: bool = False  # jax.checkpoint the forward: trade FLOPs for HBM
    # Data echoing (Choi et al. 2019): run each host-loaded batch through
    # the train step N times. Augmentation keys fold in state.step, so with
    # a STOCHASTIC pipeline each echo sees a fresh augmentation of the same
    # decoded images — useful when host PNG decode can't feed the chip
    # (PERFORMANCE.md "Host data path"): echo 2-3 restores chip utilization
    # at the cost of sample diversity per optimizer step. With a
    # deterministic pipeline (no_new_aug / Cityscapes sources) echoes are
    # bit-identical repeats (the loop warns). Echoed steps count toward the
    # poly-LR horizon and steps_per_epoch. 1 = off (reference parity).
    data_echo: int = 1
    #   headroom (larger batches / resolutions per chip)
    steps_per_epoch: Optional[int] = None  # None => derived from dataset length
    # Also evaluate the best model through the int8 PTQ serving path at the
    # end of the run and report the mIoU delta vs bf16 (models/quantize.py).
    final_int8_eval: bool = False
    # Capture a jax.profiler timeline trace of N warm train steps (written
    # under <obs.log_dir>/<run>/trace, view with TensorBoard / xprof; the
    # reference has no timeline tracer — SURVEY.md section 5). 0 = off.
    profile_steps: int = 0
    # Failure detection (the reference has none — SURVEY.md section 5): halt
    # with a diagnostic when any train metric (loss components, grad_norm)
    # goes NaN/Inf, instead of silently burning chip-hours on poisoned
    # params. Checked at the existing log points (print_freq_batch / epoch
    # mean), where scalars cross to the host anyway — no extra device syncs
    # on the hot path.
    halt_on_nonfinite: bool = True


@dataclass(frozen=True)
class ObservabilityConfig:
    """Metric logging (reference W&B surface, ``utils.py:120-288``)."""

    backend: str = "auto"  # auto | wandb | jsonl | null
    project: str = "RTDA-SemSeg"
    entity: str = "RTDA-SemSeg"
    run_name: Optional[str] = None
    log_dir: str = "./logs"
    # Per-module gradient/parameter L2 norms every N steps — the TPU-native
    # counterpart of the reference's ``wandb.watch(model, log="all")``
    # (``main.py:351-352``; wandb's default log_freq is 1000). The norms are
    # computed inside the jitted step (cheap fused reductions; no host
    # transfer until a log point). 0 = off (the step program stays minimal;
    # the global ``grad_norm`` scalar is always logged regardless).
    watch_freq_steps: int = 0
    # Mirror saved checkpoints to the W&B run (reference
    # ``utils.py:404-410`` ``wandb.save(policy="live")``). Off by default:
    # Orbax checkpoints are directories and this environment is zero-egress;
    # no-op on the jsonl/null backends.
    upload_checkpoints: bool = False


# ---------------------------------------------------------------------------
# Top-level config
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ExperimentConfig:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    adversarial: AdversarialConfig = field(default_factory=AdversarialConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    augment: AugmentConfig = field(default_factory=AugmentConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    obs: ObservabilityConfig = field(default_factory=ObservabilityConfig)

    @property
    def train_mode(self) -> str:
        """One of vanilla | lovasz | adversarial | adversarial_lovasz.

        Matches the reference's 4 epoch engines (train.py:28,163 and
        train_lovasz.py:29,172)."""
        if self.adversarial.enabled:
            return "adversarial_lovasz" if self.loss.use_lovasz else "adversarial"
        return "lovasz" if self.loss.use_lovasz else "vanilla"

    @property
    def train_size(self) -> Tuple[int, int]:
        if self.data.train_size_override is not None:
            return self.data.train_size_override
        if self.data.train_dataset == "cityscapes":
            return self.data.cityscapes_size
        return self.data.gta5_size

    @property
    def eval_size(self) -> Tuple[int, int]:
        return self.data.eval_size_override or self.data.cityscapes_size

    def replace(self, **kw) -> "ExperimentConfig":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


# ---------------------------------------------------------------------------
# Baseline presets (the 5 configs of BASELINE.json)
# ---------------------------------------------------------------------------


def get_preset(name: str) -> ExperimentConfig:
    """Named experiment presets matching ``BASELINE.json['configs']``."""
    base = ExperimentConfig()
    if name == "bisenet_source_small":
        # "BiSeNet (ResNet-18) source-only on GTA5, 512x256 crop, batch 2,
        #  no aug (CPU-runnable)"
        return base.replace(
            data=dataclasses.replace(
                base.data, gta5_size=(256, 512), cityscapes_size=(256, 512),
                eval_batch_size=2,
            ),
            augment=dataclasses.replace(base.augment, pipeline="no_new_aug"),
            train=dataclasses.replace(base.train, batch_size=2),
        )
    if name == "bisenet_source_aug":
        # "BiSeNet source-only + full aug pipeline, 1024x512"
        return base.replace(
            data=dataclasses.replace(base.data, gta5_size=(512, 1024)),
            augment=dataclasses.replace(base.augment, pipeline="all_four_combined"),
        )
    if name == "deeplabv2_cityscapes":
        # "DeepLabV2 (ResNet-101, ASPP) Cityscapes upper-bound training + eval"
        return base.replace(
            model=dataclasses.replace(base.model, name="deeplabv2"),
            data=dataclasses.replace(base.data, train_dataset="cityscapes"),
            optimizer=dataclasses.replace(
                base.optimizer, name="sgd", learning_rate=2.5e-4
            ),
            augment=dataclasses.replace(base.augment, pipeline="no_new_aug"),
        )
    if name == "bisenet_adversarial":
        # "BiSeNet + FC-Discriminator adversarial UDA (CE loss)"
        return base.replace(
            adversarial=dataclasses.replace(base.adversarial, enabled=True),
        )
    if name == "bisenet_adversarial_lovasz":
        # "Full model: adversarial UDA + hybrid CE+Lovasz, best-aug pipeline"
        return base.replace(
            adversarial=dataclasses.replace(base.adversarial, enabled=True),
            loss=dataclasses.replace(base.loss, use_lovasz=True),
            augment=dataclasses.replace(base.augment, pipeline="all_four_combined"),
        )
    raise ValueError(
        f"Unknown preset {name!r}. Presets: bisenet_source_small, "
        "bisenet_source_aug, deeplabv2_cityscapes, bisenet_adversarial, "
        "bisenet_adversarial_lovasz"
    )


PRESETS = (
    "bisenet_source_small",
    "bisenet_source_aug",
    "deeplabv2_cityscapes",
    "bisenet_adversarial",
    "bisenet_adversarial_lovasz",
)
