"""N-optimizer-step training-dynamics parity vs a torch oracle.

Round-1 left a gap: weight conversion proved *forward* parity only
(test_convert.py), nothing showed the training dynamics match. These tests
close it: identical (converted) weights, identical f32 batches, N
reference-semantics torch optimizer steps vs ``make_train_step``, comparing
the full loss trajectory and end-state per-parameter deltas for all four
modes — vanilla / lovasz (reference ``train.py:28``, ``train_lovasz.py:29``)
and adversarial / adversarial+lovasz incl. the D-first,
G-through-updated-D ordering (``train.py:163-313``,
``train_lovasz.py:172-349``). The default tier runs N=1; the slow tier runs
N=10 with fresh batches and per-batch poly-LR decay each step, bounding the
compounded drift (BN running stats x optimizer moments x LR schedule) that
single-step parity cannot see.

Both sides run in float64 (the package's hard f32 casts are all
"at least f32" so x64 makes them f64), which makes the comparison decisive:
measured agreement is ~1e-12 relative on every gradient, so the tolerances
below (1e-6) would catch any genuine semantic drift while being immune to
f32 rounding noise (in f32 the same comparison shows ~1e-2 noise between
the two equivalent-but-differently-associated programs).

Known, bounded semantic deltas (documented, tolerated below):
- BN running var: torch stores the *unbiased* batch var, flax the biased
  one — relative gap 1/(N-1) ~ 3e-5 at the 32k-pixel batches used here.
- Conv bias in ConvBlock units: the reference's conv(bias=True)->BN folds
  the bias into the batch mean exactly in train mode; torch's bias param
  only moves by -lr*wd*bias (zero data gradient), which the converter's
  bias->running-mean fold absorbs to O(lr*wd) ~ 2.5e-8.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from test_convert import TorchBiSeNet, TorchFCDiscriminator  # noqa: E402

from rtda_semanticsegmentation_tpu.config import get_preset  # noqa: E402
from rtda_semanticsegmentation_tpu.models.convert import (  # noqa: E402
    convert_full_torch_checkpoint,
    load_npz_into_variables,
)
from rtda_semanticsegmentation_tpu.models.factory import (  # noqa: E402
    build_discriminator,
    build_model,
    init_model,
)
from rtda_semanticsegmentation_tpu.train.optim import (  # noqa: E402
    build_discriminator_tx,
    build_generator_tx,
)
from rtda_semanticsegmentation_tpu.train.schedule import (  # noqa: E402
    poly_lr_schedule,
)
from rtda_semanticsegmentation_tpu.train.state import (  # noqa: E402
    ModelState,
    TrainState,
)
from rtda_semanticsegmentation_tpu.train.steps import (  # noqa: E402
    make_train_step,
)

H, W, B = 64, 96, 2
MAX_ITER = 100
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@pytest.fixture(autouse=True)
def _x64():
    """float64 on both sides makes the parity decisive (see module doc)."""
    jax.config.update("jax_enable_x64", True)
    try:
        yield
    finally:
        jax.config.update("jax_enable_x64", False)


def _f64(tree):
    return jax.tree.map(
        lambda a: jnp.asarray(a, jnp.float64)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
        tree,
    )


def _normalize_torch(u8_nhwc: np.ndarray) -> torch.Tensor:
    # f64, same op order as ops.augment.normalize_u8 at compute dtype f64
    x = u8_nhwc.astype(np.float64) / 255.0
    x = (x - np.array(IMAGENET_MEAN, np.float64)) / np.array(
        IMAGENET_STD, np.float64
    )
    return torch.from_numpy(x.transpose(0, 3, 1, 2)).contiguous()


def _lovasz_grad_torch(gt_sorted: torch.Tensor) -> torch.Tensor:
    # Lovasz extension gradient (Berman et al. 2018, alg. 1): 1 - I/U over
    # cumsums of the descending-sorted ground truth, first-differenced.
    gts = gt_sorted.sum()
    intersection = gts - gt_sorted.cumsum(0)
    union = gts + (1.0 - gt_sorted).cumsum(0)
    jaccard = 1.0 - intersection / union
    if len(gt_sorted) > 1:
        jaccard = torch.cat([jaccard[:1], jaccard[1:] - jaccard[:-1]])
    return jaccard


def _lovasz_softmax_torch(
    probas: torch.Tensor, labels: torch.Tensor, ignore: int = 255
) -> torch.Tensor:
    """Reference LovaszSoftmax semantics (lovasz_loss.py:76-200): mean over
    classes present in the batch, ignore pixels masked out, errors sorted
    descending."""
    c = probas.shape[1]
    probas = probas.permute(0, 2, 3, 1).reshape(-1, c)
    labels = labels.reshape(-1)
    valid = labels != ignore
    probas, labels = probas[valid], labels[valid]
    losses = []
    for cls in labels.unique():
        fg = (labels == cls).to(probas.dtype)
        if fg.sum() == 0:
            continue
        errors = (fg - probas[:, cls]).abs()
        errors_sorted, order = torch.sort(errors, descending=True)
        losses.append(
            torch.dot(errors_sorted, _lovasz_grad_torch(fg[order].detach()))
        )
    return torch.stack(losses).mean()


def _randomized_bn(net: tnn.Module, seed: int) -> tnn.Module:
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
    return net


def _to_variables(net, model_kind, tmp_path, template, tag):
    state = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    arrays = convert_full_torch_checkpoint(state, model_kind, 18)
    path = str(tmp_path / f"{tag}.npz")
    np.savez(path, **arrays)
    # f64 template: the loader casts into template dtypes, and one f64
    # optimizer step moves params by ~1e-9 — far below f32 resolution.
    return _f64(load_npz_into_variables(_f64(template), path, model_kind))


def _batch(seed):
    rng = np.random.RandomState(seed)
    images = rng.randint(0, 256, (B, H, W, 3), np.uint8)
    labels = rng.randint(0, 19, (B, H, W)).astype(np.int32)
    labels[rng.rand(B, H, W) < 0.1] = 255  # ignore pixels
    target = rng.randint(0, 256, (B, H, W, 3), np.uint8)
    return images, labels, target


def _cfg(mode: str):
    preset = {
        "vanilla": "bisenet_source_small",
        "lovasz": "bisenet_source_small",
        "adversarial": "bisenet_adversarial",
        "adversarial_lovasz": "bisenet_adversarial_lovasz",
    }[mode]
    import dataclasses

    cfg = get_preset(preset)
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model, compute_dtype="float64", pretrained_backbone=None
        ),
        augment=dataclasses.replace(cfg.augment, pipeline="no_new_aug"),
        loss=dataclasses.replace(
            cfg.loss,
            use_lovasz=mode in ("lovasz", "adversarial_lovasz"),
            lovasz_impl="sort",  # exact sort == reference algorithm
        ),
        train=dataclasses.replace(cfg.train, batch_size=B),
    )
    if mode == "vanilla":
        # cover torch-SGD(momentum, wd) semantics — the reference's BiSeNet
        # default (config.py:86-95); the other modes keep their preset
        # optimizer (covers torch-Adam semantics too).
        cfg = cfg.replace(
            optimizer=dataclasses.replace(cfg.optimizer, name="sgd")
        )
    return cfg


def _delta_parity(before, ours_after, ref_after, what, rel_tol=1e-6):
    """Per-parameter delta comparison: ||d_ours - d_ref|| <= tol * scale.

    scale is the reference delta norm, floored at the *global* delta RMS
    (scaled to the leaf size) so near-zero-delta leaves (deep BN biases,
    where f32 forward noise dominates) are judged against the step's
    overall magnitude, not their own vanishing one. A global all-params
    relative error is asserted too.
    """
    fb = jax.tree_util.tree_leaves_with_path(before)
    fo = {jax.tree_util.keystr(p): v for p, v in
          jax.tree_util.tree_leaves_with_path(ours_after)}
    fr = {jax.tree_util.keystr(p): v for p, v in
          jax.tree_util.tree_leaves_with_path(ref_after)}
    deltas = {}
    for path, b in fb:
        k = jax.tree_util.keystr(path)
        d_ours = np.asarray(fo[k], np.float64) - np.asarray(b, np.float64)
        d_ref = np.asarray(fr[k], np.float64) - np.asarray(b, np.float64)
        deltas[k] = (d_ours.ravel(), d_ref.ravel())
    all_ours = np.concatenate([d for d, _ in deltas.values()])
    all_ref = np.concatenate([d for _, d in deltas.values()])
    g_norm = np.linalg.norm(all_ref)
    assert g_norm > 1e-12, f"{what}: vacuous test — reference step moved nothing"
    g_err = np.linalg.norm(all_ours - all_ref) / g_norm
    assert g_err < rel_tol, f"{what} global relative delta error {g_err:.2e}"
    rms = g_norm / np.sqrt(all_ref.size)
    moved = 0
    for k, (d_ours, d_ref) in deltas.items():
        n_ref = np.linalg.norm(d_ref)
        if n_ref < 1e-12:  # e.g. frozen/zero-grad params
            assert np.linalg.norm(d_ours) < 1e-9, f"{what}{k}: ref froze, ours moved"
            continue
        moved += 1
        scale = max(n_ref, rms * np.sqrt(d_ref.size))
        err = np.linalg.norm(d_ours - d_ref) / scale
        assert err < rel_tol, f"{what}{k}: relative delta error {err:.2e}"
    assert moved >= min(10, len(deltas)), (
        f"{what}: vacuous test — only {moved} params moved"
    )


def _batch_stats_parity(ours, ref, cfg, n_steps=1):
    """Running-stat parity. FoldableBatchNorm tracks torch's unbiased
    running-var update exactly (incl. the ARM gate BNs where N = B), so
    vars are tight. Means tolerate one optimizer-step of conv-bias fold
    residue: torch's ConvBlock conv biases are functionally dead (the
    train-mode BN subtracts them via the batch mean) yet still move under
    weight decay — by ~lr per step under Adam (update = wd*b/|wd*b|-ish)
    — and the converter's bias->BN-mean fold absorbs that drift.
    """
    fo = {jax.tree_util.keystr(p): v for p, v in
          jax.tree_util.tree_leaves_with_path(ours)}
    fr = {jax.tree_util.keystr(p): v for p, v in
          jax.tree_util.tree_leaves_with_path(ref)}
    assert set(fo) == set(fr)
    # the conv-bias fold residue accumulates ~lr per optimizer step; the
    # rtol loosens with steps for the same chaotic-compounding reason as
    # _traj_tol (parameters diverge at ~4x/step in f64)
    mean_atol = 2.5 * cfg.optimizer.learning_rate * n_steps
    rtol = 1e-6 if n_steps == 1 else 1e-3
    for k in fo:
        atol = mean_atol if k.endswith("['mean']") else 1e-9
        np.testing.assert_allclose(
            np.asarray(fo[k], np.float64), np.asarray(fr[k], np.float64),
            rtol=rtol, atol=atol, err_msg=k,
        )


def _run_ours(cfg, g_vars, d_vars, batches):
    """Run len(batches) jitted optimizer steps; returns (state, metric list)."""
    model = build_model(cfg.model)
    g = ModelState.create(
        model.apply,
        g_vars,
        build_generator_tx(
            cfg.optimizer,
            MAX_ITER,
            # same exemption the train loop applies: the reference's unused
            # aux heads receive neither grads nor decay (grad-None in torch)
            decay_exempt=("supervision1", "supervision2"),
        ),
    )
    d = None
    if cfg.adversarial.enabled:
        disc = build_discriminator(cfg.model)
        d = ModelState.create(
            disc.apply, d_vars, build_discriminator_tx(cfg.adversarial, MAX_ITER)
        )
    state = TrainState.create(g, d)
    step = jax.jit(
        make_train_step(
            cfg,
            poly_lr_schedule(cfg.optimizer.learning_rate, MAX_ITER),
            poly_lr_schedule(cfg.adversarial.disc_learning_rate, MAX_ITER),
        )
    )
    all_metrics = []
    for batch in batches:
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        all_metrics.append({k: float(v) for k, v in metrics.items()})
    return state, all_metrics


def _traj_tol(t: int) -> float:
    """Per-step relative loss tolerance: equivalent f64 programs drift apart
    chaotically at ~4x/step through these networks (measured: rel diff
    5e-16 at t=0 growing to 3.4e-6 at t=9 for the adversarial mode — pure
    reassociation noise amplified by Adam's early sign-like updates). A
    *semantic* divergence (wrong wd order, LR schedule, loss weighting)
    shows at >=1e-4 within a step or two and still fails everywhere."""
    return min(1e-9 * 4.0 ** t, 1e-3)


def _poly_lr_torch(opt, base_lr, t):
    """Reference utils.py:27-58: lr = base*(1 - t/max_iter)^0.9 written into
    the param groups every batch (same shared step drives G and D)."""
    lr = base_lr * (1.0 - t / MAX_ITER) ** 0.9
    for grp in opt.param_groups:
        grp["lr"] = lr


def _torch_generator_optimizer(net, cfg):
    # reference main.py:279-292: SGD(momentum, wd) or Adam(wd) — torch's
    # L2-into-gradient weight decay in both cases.
    if cfg.optimizer.name == "sgd":
        return torch.optim.SGD(
            net.parameters(),
            lr=cfg.optimizer.learning_rate,
            momentum=cfg.optimizer.sgd_momentum,
            weight_decay=cfg.optimizer.weight_decay,
        )
    return torch.optim.Adam(
        net.parameters(),
        lr=cfg.optimizer.learning_rate,
        betas=(cfg.optimizer.adam_b1, cfg.optimizer.adam_b2),
        weight_decay=cfg.optimizer.weight_decay,
    )


@pytest.mark.parametrize(
    "mode,n_steps",
    [
        ("vanilla", 1),
        ("lovasz", 1),
        # the multi-step tier bounds the COMPOUNDED dynamics the 0.5-pt mIoU
        # target cares about: BN running-stat evolution x Adam/SGD moment
        # buildup x per-batch poly-LR decay over fresh batches each step
        pytest.param("vanilla", 10, marks=pytest.mark.slow),
        pytest.param("lovasz", 10, marks=pytest.mark.slow),
    ],
)
def test_source_step_parity(mode, n_steps, tmp_path):
    cfg = _cfg(mode)
    torch.manual_seed(7)
    net = _randomized_bn(TorchBiSeNet().train(), 7)

    model = build_model(cfg.model)
    template = init_model(model, jax.random.PRNGKey(0), (1, H, W, 3))
    g_vars = _f64(_to_variables(net, "bisenet", tmp_path, template, "g0"))
    net = net.double()

    # --- torch oracle: reference train.py:87-156 / train_lovasz.py:98-105,
    # CPU path (no autocast/scaler), per-batch poly-LR (utils.py:27-58). ---
    opt = _torch_generator_optimizer(net, cfg)
    ref_losses = []
    for t in range(n_steps):
        images, labels, _ = _batch(t)
        _poly_lr_torch(opt, cfg.optimizer.learning_rate, t)
        logits = net(_normalize_torch(images).double())
        y = torch.from_numpy(labels.astype(np.int64))
        loss_t = F.cross_entropy(logits, y, ignore_index=255)
        if mode == "lovasz":
            loss_t = loss_t + cfg.loss.lovasz_weight * _lovasz_softmax_torch(
                F.softmax(logits, dim=1), y
            )
        opt.zero_grad()
        loss_t.backward()
        opt.step()
        ref_losses.append(loss_t.item())

    # --- ours: the same steps through one jitted program ---
    batches = [
        {"image": jnp.asarray(i), "label": jnp.asarray(l)}
        for i, l, _ in (_batch(t) for t in range(n_steps))
    ]
    new_state, metrics = _run_ours(cfg, g_vars, None, batches)

    for t in range(n_steps):
        assert metrics[t]["loss"] == pytest.approx(
            ref_losses[t], rel=_traj_tol(t)
        ), f"loss trajectory diverged at step {t}"

    ref_after = _f64(_to_variables(net, "bisenet", tmp_path, template, "g1"))
    _delta_parity(
        g_vars["params"],
        new_state.generator.params,
        ref_after["params"],
        "G:",
        # Adam's step-1 update is ~sign(g), amplifying relative error on
        # near-zero-gradient elements; SGD deltas are plain lr*(g + wd*p).
        # Multi-step: the ~4x/step chaotic amplification (_traj_tol) reaches
        # ~1e-3 relative on end-state deltas by t=10 (measured 1.03e-3 for
        # the adversarial mode); a semantic bug amplifies the same way and
        # lands orders of magnitude above 3e-3.
        rel_tol=1e-6 if n_steps == 1 else 3e-3,
    )
    _batch_stats_parity(
        new_state.generator.batch_stats, ref_after["batch_stats"], cfg,
        n_steps=n_steps,
    )


@pytest.mark.parametrize(
    "mode,n_steps",
    [
        ("adversarial", 1),
        ("adversarial_lovasz", 1),
        pytest.param("adversarial", 10, marks=pytest.mark.slow),
        pytest.param("adversarial_lovasz", 10, marks=pytest.mark.slow),
    ],
)
def test_adversarial_step_parity(mode, n_steps, tmp_path):
    cfg = _cfg(mode)
    torch.manual_seed(11)
    net = _randomized_bn(TorchBiSeNet().train(), 11)
    disc_t = TorchFCDiscriminator().train()
    with torch.no_grad():
        for p in disc_t.parameters():
            p.normal_(0.0, 0.02, generator=torch.Generator().manual_seed(3))

    model = build_model(cfg.model)
    g_template = init_model(model, jax.random.PRNGKey(0), (1, H, W, 3))
    g_vars = _f64(_to_variables(net, "bisenet", tmp_path, g_template, "g0"))
    disc = build_discriminator(cfg.model)
    d_template = init_model(disc, jax.random.PRNGKey(1), (1, H, W, 19))
    d_vars = _f64(
        _to_variables(disc_t, "discriminator", tmp_path, d_template, "d0")
    )
    net = net.double()
    disc_t = disc_t.double()

    # --- torch oracle: reference train.py:163-313 exactly, per step:
    # shared-global-step poly LR on BOTH optims (train.py:229-236), D step
    # on detached softmax maps first, G step through the updated D. ---
    opt_g = _torch_generator_optimizer(net, cfg)
    opt_d = torch.optim.Adam(
        disc_t.parameters(),
        lr=cfg.adversarial.disc_learning_rate,
        betas=(cfg.adversarial.disc_adam_b1, cfg.adversarial.disc_adam_b2),
        weight_decay=cfg.adversarial.disc_weight_decay,
    )
    ref_losses = []
    for t in range(n_steps):
        images, labels, target = _batch(t + 1)
        _poly_lr_torch(opt_g, cfg.optimizer.learning_rate, t)
        _poly_lr_torch(opt_d, cfg.adversarial.disc_learning_rate, t)
        pred_s = net(_normalize_torch(images).double())
        pred_t = net(_normalize_torch(target).double())
        y = torch.from_numpy(labels.astype(np.int64))

        # D step first, on detached softmax maps (train.py:249-278)
        opt_d.zero_grad()
        d_real = disc_t(F.softmax(pred_s, dim=1).detach())
        d_fake = disc_t(F.softmax(pred_t, dim=1).detach())
        loss_d = 0.5 * (
            F.binary_cross_entropy_with_logits(d_real, torch.ones_like(d_real))
            + F.binary_cross_entropy_with_logits(
                d_fake, torch.zeros_like(d_fake)
            )
        )
        loss_d.backward()
        opt_d.step()

        # G step through the *updated* D (train.py:280-306)
        opt_g.zero_grad()
        loss_seg = F.cross_entropy(pred_s, y, ignore_index=255)
        if mode == "adversarial_lovasz":
            loss_seg = loss_seg + (
                cfg.loss.lovasz_weight
                * _lovasz_softmax_torch(F.softmax(pred_s, dim=1), y)
            )
        d_out = disc_t(F.softmax(pred_t, dim=1))
        loss_adv = F.binary_cross_entropy_with_logits(
            d_out, torch.ones_like(d_out)
        )
        loss_g = loss_seg + cfg.adversarial.lambda_adv * loss_adv
        loss_g.backward()
        opt_g.step()
        ref_losses.append((loss_d.item(), loss_g.item(), loss_adv.item()))

    # --- ours ---
    batches = [
        {
            "image": jnp.asarray(i),
            "label": jnp.asarray(l),
            "target_image": jnp.asarray(tg),
        }
        for i, l, tg in (_batch(t + 1) for t in range(n_steps))
    ]
    new_state, metrics = _run_ours(cfg, g_vars, d_vars, batches)

    for t in range(n_steps):
        loss_d_t, loss_g_t, loss_adv_t = ref_losses[t]
        tol = _traj_tol(t)
        assert metrics[t]["loss_d"] == pytest.approx(loss_d_t, rel=tol), t
        assert metrics[t]["loss"] == pytest.approx(loss_g_t, rel=tol), t
        assert metrics[t]["loss_adv_g"] == pytest.approx(loss_adv_t, rel=tol), t

    ref_g = _f64(_to_variables(net, "bisenet", tmp_path, g_template, "g1"))
    ref_d = _f64(
        _to_variables(disc_t, "discriminator", tmp_path, d_template, "d1")
    )
    _delta_parity(
        g_vars["params"],
        new_state.generator.params,
        ref_g["params"],
        "G:",
        rel_tol=1e-6 if n_steps == 1 else 3e-3,
    )
    _delta_parity(
        d_vars["params"],
        new_state.discriminator.params,
        ref_d["params"],
        "D:",
        rel_tol=1e-6 if n_steps == 1 else 3e-3,
    )
