"""Optimizer construction.

Parity with the reference's optimizer setup:

- Generator: SGD(momentum 0.9, wd 1e-4, lr 2.5e-4) or Adam(lr 1e-4, wd 1e-4)
  (reference ``config.py:85-95``, ``main.py:279-292``). The reference's
  "weight_decay" is torch's L2-into-gradient for both SGD and Adam, i.e.
  optax.add_decayed_weights *before* the optimizer kernel — NOT decoupled
  AdamW. We match that.
- Discriminator: Adam(lr 2.5e-5, betas (0.9, 0.99), wd 0)
  (reference ``config.py:281-287``, ``main_adversarial.py:217-227``).
- Poly LR decay applied per step inside the transformation chain
  (reference mutates param_groups every batch, ``utils.py:27-58``).
"""

from __future__ import annotations

import jax
import optax

from ..config import AdversarialConfig, OptimizerConfig
from .schedule import poly_lr_schedule


def bn_param_labels(params) -> dict:
    """'frozen' for BatchNorm scale/bias, 'train' for everything else.

    Identifies BN affine parameters by their flax path (``.../bn/scale``,
    ``.../bn/bias``). Used to reproduce DeepLabV2's frozen BN: the reference
    sets ``requires_grad=False`` on every BN parameter while leaving the
    layers in train mode, so batch statistics still update but the affine
    params never do (reference ``deeplabv2.py:13-25,74-75,100-101``).
    """
    import jax

    def label(path, _) -> str:
        keys = [getattr(k, "key", str(k)) for k in path]
        frozen = (
            len(keys) >= 2 and keys[-2] == "bn" and keys[-1] in ("scale", "bias")
        )
        return "frozen" if frozen else "train"

    return jax.tree_util.tree_map_with_path(label, params)


def build_generator_tx(
    cfg: OptimizerConfig,
    max_iter: int,
    freeze_bn: bool = False,
    decay_exempt: tuple = (),
) -> optax.GradientTransformation:
    """``decay_exempt``: top-level param-tree module names excluded from
    weight decay. Parity detail: torch optimizers skip params whose ``.grad``
    is None — in the reference the aux supervision heads are computed but
    never enter any loss (``train.py:113-120``), so they receive neither
    gradient nor weight decay and stay frozen at init. With ``aux_weight==0``
    the train loop passes ('supervision1', 'supervision2') here to match
    (verified by the one-step parity tests, tests/test_train_parity.py).
    """
    schedule = poly_lr_schedule(cfg.learning_rate, max_iter, cfg.poly_power)
    parts = []
    if cfg.weight_decay:
        if decay_exempt:
            exempt = frozenset(decay_exempt)
            parts.append(
                optax.add_decayed_weights(
                    cfg.weight_decay,
                    mask=lambda params: {
                        k: jax.tree.map(lambda _: k not in exempt, sub)
                        for k, sub in params.items()
                    },
                )
            )
        else:
            parts.append(optax.add_decayed_weights(cfg.weight_decay))
    if cfg.name == "sgd":
        # torch SGD(momentum): buf = m*buf + g; p -= lr*buf  -> trace + scale.
        parts.append(optax.trace(decay=cfg.sgd_momentum, nesterov=False))
    elif cfg.name == "adam":
        parts.append(
            optax.scale_by_adam(b1=cfg.adam_b1, b2=cfg.adam_b2, eps=1e-8)
        )
    else:
        raise ValueError(f"unknown optimizer {cfg.name!r}; options: sgd, adam")
    parts.append(optax.scale_by_learning_rate(schedule))
    tx = optax.chain(*parts)
    if freeze_bn:
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()}, bn_param_labels
        )
    return tx


def build_discriminator_tx(
    cfg: AdversarialConfig, max_iter: int, poly_power: float = 0.9
) -> optax.GradientTransformation:
    schedule = poly_lr_schedule(cfg.disc_learning_rate, max_iter, poly_power)
    parts = []
    if cfg.disc_weight_decay:
        parts.append(optax.add_decayed_weights(cfg.disc_weight_decay))
    if cfg.disc_optimizer == "adam":
        parts.append(
            optax.scale_by_adam(b1=cfg.disc_adam_b1, b2=cfg.disc_adam_b2, eps=1e-8)
        )
    elif cfg.disc_optimizer == "sgd":
        parts.append(optax.trace(decay=0.9, nesterov=False))
    else:
        raise ValueError(
            f"unknown disc optimizer {cfg.disc_optimizer!r}; options: adam, sgd"
        )
    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts)
