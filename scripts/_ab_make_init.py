"""Create the SHARED initial weights for the reference A/B:

1. constructs the reference's torch BiSeNet-R18 generator and
   FC-Discriminator (through the shims, seeded) via the reference's own
   ``model_loader``;
2. writes reference-format init checkpoints (``epoch=-1`` so the
   reference's resume path starts at epoch 0, ``main.py:330-333``) — one
   vanilla container, one adversarial container. Optimizer states are
   deliberately omitted: both loaders warn and keep the freshly-constructed
   optimizer (``utils.py:467-469``), matching our side's fresh optax init;
3. converts the same state_dicts to flax-path ``.npz`` files with
   ``models/convert.py`` so our CLI trains from bit-identical weights
   (``--pretrained_backbone`` / ``--pretrained_discriminator``).

Run as a subprocess by ``scripts/ab_reference.py``.
"""

import argparse
import os
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--shims", required=True)
    p.add_argument("--reference", default="/root/reference")
    p.add_argument("--repo", default="/root/repo")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    sys.path.insert(0, args.shims)
    sys.path.insert(0, args.reference)
    sys.path.insert(0, args.repo)

    import numpy as np
    import torch

    import config as cfg  # reference config (through the shims)
    from model_loader import get_discriminator, get_model

    from rtda_semanticsegmentation_tpu.models.convert import (
        convert_full_torch_checkpoint,
    )

    torch.manual_seed(args.seed)
    cfg.MODEL_NAME = "bisenet"
    cfg.BISENET_CONTEXT_PATH = "resnet18"
    cfg.DEVICE = torch.device("cpu")

    model_g = get_model(config_obj=cfg)
    model_d = get_discriminator(config_obj=cfg)
    state_g = model_g.state_dict()
    state_d = model_d.state_dict()

    os.makedirs(args.out, exist_ok=True)
    meta = {"epoch": -1, "global_step": 0, "best_miou": 0.0}
    torch.save(
        {**meta, "model_state_dict": state_g},
        os.path.join(args.out, "init_vanilla.pth"),
    )
    torch.save(
        {**meta, "model_G_state_dict": state_g, "model_D_state_dict": state_d},
        os.path.join(args.out, "init_adversarial.pth"),
    )

    to_np = lambda sd: {k: v.detach().numpy() for k, v in sd.items()}
    np.savez(
        os.path.join(args.out, "init_g.npz"),
        **convert_full_torch_checkpoint(to_np(state_g), "bisenet", 18),
    )
    np.savez(
        os.path.join(args.out, "init_d.npz"),
        **convert_full_torch_checkpoint(to_np(state_d), "discriminator", 18),
    )
    print(f"init weights written to {args.out}")


if __name__ == "__main__":
    main()
