"""Command-line entry points.

- ``python -m rtda_semanticsegmentation_tpu.cli.train`` — source-only
  training (reference ``main.py``).
- ``python -m rtda_semanticsegmentation_tpu.cli.train_adversarial`` —
  adversarial UDA training (reference ``main_adversarial.py``).
- ``python -m rtda_semanticsegmentation_tpu.data.preprocess`` — offline GTA5
  label conversion (reference ``datasets/preprocess_gta5_labels.py``).
- ``python -m rtda_semanticsegmentation_tpu.cli.convert_torch_weights`` —
  torchvision/.pth -> flax .npz backbone converter (the reference downloads
  torchvision pretrained weights at build time; we convert offline).
- ``python -m rtda_semanticsegmentation_tpu.cli.debug_dataset`` — visualize a
  sample pair (reference ``scripts/debug_{gta,cityscapes}.py``).
- ``python -m rtda_semanticsegmentation_tpu.cli.predict`` — batch inference
  on an image folder from a checkpoint (bf16 / int8 PTQ serving; no
  reference counterpart).
"""
