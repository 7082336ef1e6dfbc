"""rtda_semanticsegmentation_tpu: a TPU-native real-time domain-adaptation
semantic-segmentation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
PyTorch project ``arman-rn/RTDA-SemanticSegmentation`` (GTA5->Cityscapes
unsupervised adversarial domain adaptation with BiSeNet / DeepLabV2 /
FC-Discriminator and a hybrid Cross-Entropy + Lovasz-Softmax loss):

- models are ``flax.linen`` modules in NHWC layout, compiled by XLA for the
  TPU MXU (bf16 compute / f32 params);
- the whole per-batch loop of the reference (poly LR, generator forward(s),
  discriminator update, generator update) collapses into a single jitted
  train step per training mode;
- data parallelism is expressed with ``jax.sharding.Mesh`` + ``NamedSharding``
  (gradient all-reduce and eval confusion-matrix reduction are XLA ICI
  collectives, not a communication library);
- augmentation (ColorJitter / ISONoise / CoarseDropout / Normalize) runs
  batched on device from uint8 inputs, keyed by ``jax.random`` keys;
- evaluation accumulates the 19x19 confusion matrix on device.

Package layout::

    config.py     frozen dataclass configs + the 5 baseline experiment presets
    data/         label semantics, GTA5/Cityscapes datasets, host loader, LUT tool
    ops/          losses, metrics, augmentation, resize, pallas kernels
    models/       BiSeNet, DeepLabV2, FCDiscriminator, ResNet backbones, factory
    train/        train states, jitted steps, eval engine, schedules, trainer
    parallel/     mesh construction and sharding rules
    checkpoint/   orbax-backed best/periodic checkpoint manager
    utils/        seeding, metric logging (W&B or JSONL), profiler, viz
    cli/          train / train_adversarial / preprocess_gta5_labels entrypoints
"""

__version__ = "0.1.0"
