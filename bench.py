"""Benchmark: BiSeNet-ResNet18 inference throughput at 1024x512 on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Headline metric matches BASELINE.json's north star: 1024x512 images/sec/chip
(target >= 300 on TPU v5e). Methodology mirrors the reference profiler
(``utils.py:292-382``: 10 warmup + 100 timed iterations with device sync),
but batched — the reference times batch 1; real-time *throughput* on TPU
wants the MXU fed, so the headline is best-batch throughput and the batch-1
p50 latency is reported alongside on stderr.

Two serving precisions are swept and the faster one is the headline:
bf16 (exact eval path) and int8 PTQ (``ops/quant.py`` — v5e's MXU runs s8 at
2x the bf16 rate; measured 1.27x end-to-end at batch 128 with 0.998 argmax
agreement). The int8 number only qualifies if its on-device argmax agreement
with bf16 stays above 0.99 on a held-out batch; both sweeps are printed to
stderr either way.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMG_PER_SEC = 300.0  # BASELINE.md: >=300 img/s/chip @ 1024x512, v5e
H, W = 512, 1024
WARMUP, ITERS = 10, 100
# v5e peak per chip: 197 TFLOP/s bf16, 394 TOP/s int8. MFU rows divide XLA
# cost-analysis FLOPs by wall time and this peak. NOTE XLA counts one MAC as
# 2 FLOPs only in its "flops" key for dots/convs; that convention matches
# the 197e12 marketing number, so the ratio is apples-to-apples.
V5E_PEAK_BF16 = 197e12
V5E_PEAK_INT8 = 394e12


def _mfu(flops_per_iter, sec_per_iter, peak=V5E_PEAK_BF16):
    if not flops_per_iter or not sec_per_iter:
        return None
    return flops_per_iter / sec_per_iter / peak


# 19-class palette for the learnable synthetic batches (any injective
# class->color map works; noise keeps it non-trivial)
_PALETTE = np.stack(
    np.meshgrid([32, 112, 192], [32, 112, 192], [16, 128, 240], indexing="ij"),
    axis=-1,
).reshape(-1, 3)[:19].astype(np.int16)


def _learnable_batch(rng, batch, h, w, cells=32):
    """(uint8 images, int32 labels): piecewise-constant 19-class cell maps,
    images = class color + noise. LEARNABLE, unlike random labels: ~20
    optimizer steps give the net real decision structure, so the downstream
    int8 fidelity probe measures serving reality. (Weights trained on
    random labels are driven toward maximum-entropy logits — near-uniform
    outputs where ANY quantization noise flips the argmax; that regime
    over-penalizes int8 by construction.)"""
    gh, gw = h // cells, w // cells
    grid = rng.randint(0, 19, size=(batch, gh, gw))
    labels = np.repeat(np.repeat(grid, cells, 1), cells, 2)[:, :h, :w]
    imgs = _PALETTE[labels] + rng.randint(-12, 13, size=(batch, h, w, 3))
    return (
        np.clip(imgs, 0, 255).astype(np.uint8),
        labels.astype(np.int32),
    )


def _build():
    from rtda_semanticsegmentation_tpu.config import ExperimentConfig
    from rtda_semanticsegmentation_tpu.models.factory import build_model, init_model
    from rtda_semanticsegmentation_tpu.ops.augment import normalize_u8

    cfg = ExperimentConfig()
    model = build_model(cfg.model)  # bisenet-resnet18, bf16 compute
    variables = init_model(
        model, jax.random.PRNGKey(0), (1, H, W, 3), train=False
    )

    # Serve-equivalent program (serving.py:72-75): uint8 in -> ImageNet
    # normalize -> model. The timing loop adds the argmax, so the measured
    # program is exactly what cli/predict + the exported artifact run.
    @jax.jit
    def forward(variables, images):
        x = normalize_u8(images, cfg.augment).astype(jnp.bfloat16)
        return model.apply(variables, x, False)

    return variables, forward


def _time_batch(forward, variables, batch: int) -> tuple[float, float]:
    """Returns (device seconds/iter, host-roundtrip seconds/iter).

    Device time: ITERS forwards run inside ONE compiled ``lax.fori_loop``
    (input scaled by the loop index so nothing is loop-invariant, outputs
    accumulated into the carry so nothing is dead) with a single scalar
    fetch at the end — amortizing any host<->device transport latency.
    ``block_until_ready`` alone is NOT trusted: experimental PJRT
    transports can treat it as a no-op, and a per-iteration scalar fetch
    measures transport RTT instead of the device. Both failure modes were
    observed on this runner (62k img/s and 28 img/s respectively for the
    same model)."""
    # A ring of distinct input batches, indexed by the loop counter: the
    # forward can't be hoisted out of the loop (a scalar-scale trick distorts
    # results instead — measured 4x slowdowns from whatever XLA does with it),
    # and reading 12 MB/iter from HBM is ~15 us of the ~10 ms iteration.
    # uint8, as serving receives it — the forward normalizes inside.
    ring = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (4, batch, H, W, 3), np.uint8)
    )

    @jax.jit
    def loop(variables, ring, n):
        def body(i, acc):
            imgs = jax.lax.dynamic_index_in_dim(ring, i % 4, keepdims=False)
            out = forward(variables, imgs)
            return acc + jnp.sum(jnp.argmax(out, -1))

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.int32))

    float(loop(variables, ring, WARMUP))  # compile + warm
    t0 = time.perf_counter()
    float(loop(variables, ring, ITERS))
    device_per_iter = (time.perf_counter() - t0) / ITERS

    @jax.jit
    def single(variables, images):
        return jnp.sum(jnp.argmax(forward(variables, images), -1))

    float(single(variables, ring[0]))
    t0 = time.perf_counter()
    for _ in range(10):
        float(single(variables, ring[0]))
    rtt_per_iter = (time.perf_counter() - t0) / 10
    return device_per_iter, rtt_per_iter


def _train_throughput(
    mode: str = "vanilla",
    batch: int = 8,
    src_size=(H, W),
    tgt_size=(H, W),
):
    """(img/s, sec/iter, step FLOPs, final generator variables) of the
    compiled train step for ``mode`` in {'vanilla', 'flagship'}.

    'vanilla' = CE only with the full aug pipeline (reference train.py:28);
    'flagship' = adversarial + Lovasz, the framework's richest mode
    (reference train_lovasz.py:172). ``src_size``/``tgt_size`` allow the
    reference's mixed-resolution parity configuration (GTA5 source
    1280x720 + Cityscapes target 1024x512, reference ``config.py:16-21``).
    img/s counts SOURCE images, as the reference's per-epoch accounting
    does. The returned variables have seen the timing steps' training
    (~23 steps on a LEARNABLE synthetic batch, ``_learnable_batch``) —
    used downstream as realistic weights for the int8 fidelity probe.
    """
    import dataclasses

    from rtda_semanticsegmentation_tpu.config import get_preset
    from rtda_semanticsegmentation_tpu.models.factory import (
        build_discriminator,
        build_model,
        init_model,
    )
    from rtda_semanticsegmentation_tpu.obs.profiler import xla_flops
    from rtda_semanticsegmentation_tpu.train.optim import (
        build_discriminator_tx,
        build_generator_tx,
    )
    from rtda_semanticsegmentation_tpu.train.schedule import poly_lr_schedule
    from rtda_semanticsegmentation_tpu.train.state import ModelState, TrainState
    from rtda_semanticsegmentation_tpu.train.steps import make_train_step

    adversarial = mode == "flagship"
    cfg = get_preset(
        "bisenet_adversarial_lovasz" if adversarial else "bisenet_source_aug"
    )
    sh, sw = src_size
    th, tw = tgt_size
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, gta5_size=(sh, sw), cityscapes_size=(th, tw)
        ),
        train=dataclasses.replace(cfg.train, batch_size=batch),
    )
    model = build_model(cfg.model)
    g = ModelState.create(
        model.apply,
        init_model(model, jax.random.PRNGKey(0), (1, sh, sw, 3)),
        build_generator_tx(
            cfg.optimizer, 1000,
            decay_exempt=("supervision1", "supervision2"),
        ),
    )
    d = None
    if adversarial:
        disc = build_discriminator(cfg.model)
        d = ModelState.create(
            disc.apply,
            init_model(
                disc, jax.random.PRNGKey(1), (1, sh, sw, cfg.model.num_classes)
            ),
            build_discriminator_tx(cfg.adversarial, 1000),
        )
    state = TrainState.create(g, d)
    step_fn = make_train_step(
        cfg,
        poly_lr_schedule(cfg.optimizer.learning_rate, 1000),
        poly_lr_schedule(cfg.adversarial.disc_learning_rate, 1000),
    )
    step = jax.jit(step_fn, donate_argnums=0)
    rng = np.random.RandomState(0)
    imgs, labels = _learnable_batch(rng, batch, sh, sw)
    b = {"image": jnp.asarray(imgs), "label": jnp.asarray(labels)}
    if adversarial:
        t_imgs, _ = _learnable_batch(rng, batch, th, tw)
        b["target_image"] = jnp.asarray(t_imgs)
    flops = xla_flops(step_fn, state, b, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(0)
    for _ in range(3):
        state, m = step(state, b, key)
    float(m["loss"])
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, b, key)
    float(m["loss"])
    sec = (time.perf_counter() - t0) / n
    return batch / sec, sec, flops, state.generator.variables


def _deeplab_throughput():
    """DeepLabV2 (ResNet-101 + ASPP) bf16 inference row: best img/s + MFU."""
    from rtda_semanticsegmentation_tpu.config import ModelConfig
    from rtda_semanticsegmentation_tpu.models.factory import build_model, init_model
    from rtda_semanticsegmentation_tpu.obs.profiler import xla_flops

    from rtda_semanticsegmentation_tpu.config import AugmentConfig
    from rtda_semanticsegmentation_tpu.ops.augment import normalize_u8

    cfg = ModelConfig(name="deeplabv2", context_path="resnet101")
    aug_cfg = AugmentConfig()
    model = build_model(cfg)
    variables = init_model(
        model, jax.random.PRNGKey(0), (1, H, W, 3), train=False
    )

    @jax.jit
    def forward(variables, images):
        x = normalize_u8(images, aug_cfg).astype(jnp.bfloat16)
        return model.apply(variables, x, False)

    best_ips, best_b, best_sec = 0.0, 0, 0.0
    for b in (8, 16, 32):
        sec, _ = _time_batch(forward, variables, b)
        ips = b / sec
        if ips > best_ips:
            best_ips, best_b, best_sec = ips, b, sec
    x = jnp.zeros((best_b, H, W, 3), jnp.uint8)
    flops = xla_flops(forward, variables, x)
    return best_ips, best_b, _mfu(flops, best_sec)


def _build_int8(variables):
    """Calibrated int8-PTQ forward (serving path; see models/quantize.py).

    ``variables`` should be trained (or converted) weights — calibration and
    the downstream fidelity probe are only meaningful on realistic
    activation ranges, not PRNG inits."""
    from rtda_semanticsegmentation_tpu.config import ExperimentConfig
    from rtda_semanticsegmentation_tpu.models.quantize import calibrate, quantized_model

    from rtda_semanticsegmentation_tpu.ops.augment import normalize_u8

    cfg = ExperimentConfig()
    rng = np.random.RandomState(7)

    def u8():
        return jnp.asarray(_learnable_batch(rng, 4, H, W)[0])

    variables = calibrate(
        cfg.model,
        variables,
        [
            normalize_u8(u8(), cfg.augment).astype(jnp.bfloat16)
            for _ in range(3)
        ],
    )
    mq = quantized_model(cfg.model)

    # serve-equivalent program, like the bf16 one: uint8 in, normalize inside
    @jax.jit
    def forward(variables, images):
        x = normalize_u8(images, cfg.augment).astype(jnp.bfloat16)
        return mq.apply(variables, x, False)

    # the agreement probe is held out: drawn AFTER the calibration batches,
    # so calibrated activation clipping is actually exercised
    return variables, forward, u8(), cfg.model.quant_clip


def _devices_with_retry(attempts: int = 5, wait_s: float = 60.0):
    """jax.devices() with backend-init retries.

    The remote-TPU relay occasionally reports UNAVAILABLE on first contact
    (observed: a cold tunnel taking >20 min then failing). One bench run is
    the round's only recorded number, so retry the backend handshake a few
    times before giving up rather than losing the round to a transient.
    """
    from jax.extend.backend import clear_backends

    for attempt in range(attempts):
        try:
            return jax.devices()
        except RuntimeError as e:
            # Only transient relay errors are worth retrying; configuration
            # mistakes (e.g. an unknown backend from a clobbered PYTHONPATH)
            # fail deterministically and should surface immediately.
            if attempt == attempts - 1 or "unavailable" not in str(e).lower():
                raise
            print(
                f"backend init failed (attempt {attempt + 1}/{attempts}): "
                f"{e}; retrying in {wait_s:.0f}s",
                file=sys.stderr,
            )
            clear_backends()
            time.sleep(wait_s)


def main() -> None:
    dev = _devices_with_retry()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", file=sys.stderr)
    variables, forward = _build()

    # Throughput: scan batch sizes, keep the best device img/s.
    best_ips, best_b, best_sec = 0.0, 1, 0.0
    for b in (1, 2, 4, 8, 16, 32, 64, 96, 128):
        dev, rtt = _time_batch(forward, variables, b)
        ips = b / dev
        print(
            f"bf16 batch={b}: {ips:.1f} img/s device ({dev * 1e3:.2f} ms/iter; "
            f"single-call incl. host RTT {rtt * 1e3:.2f} ms)",
            file=sys.stderr,
        )
        if ips > best_ips:
            best_ips, best_b, best_sec = ips, b, dev
    from rtda_semanticsegmentation_tpu.obs.profiler import xla_flops

    def _fwd(v, im):
        return forward(v, im)

    infer_flops = xla_flops(
        _fwd, variables, jnp.zeros((best_b, H, W, 3), jnp.uint8)
    )
    mfu = _mfu(infer_flops, best_sec)
    print(
        f"bf16 best: batch={best_b} ({best_ips:.1f} img/s, "
        f"MFU {mfu:.1%})" if mfu else
        f"bf16 best: batch={best_b} ({best_ips:.1f} img/s)",
        file=sys.stderr,
    )

    # Training throughput rows (run BEFORE int8 so the fidelity probe gets
    # trained weights, not PRNG inits): vanilla + flagship swept over batch
    # (inference gained 2.1x from batch scaling; the train headline is the
    # best-batch number), each with MFU.
    trained_vars = None
    for mode, label, t_batches in (
        ("vanilla", "train vanilla+aug", (8, 16, 32)),
        ("flagship", "train adversarial+lovasz", (8, 16)),
    ):
        best_row = None
        for tb in t_batches:
            try:
                t_ips, t_sec, t_flops, g_vars = _train_throughput(mode, tb)
            except Exception as e:
                print(f"{label} (b{tb}) skipped: {e}", file=sys.stderr)
                continue
            t_mfu = _mfu(t_flops, t_sec)
            mfu_s = f", MFU {t_mfu:.1%}" if t_mfu else ""
            print(
                f"{label} (b{tb}): {t_ips:.1f} img/s "
                f"({t_sec * 1e3:.1f} ms/step{mfu_s})",
                file=sys.stderr,
            )
            if best_row is None or t_ips > best_row[1]:
                best_row = (tb, t_ips)
            if mode == "vanilla" and tb == 8:
                trained_vars = g_vars
        if best_row is not None:
            print(
                f"{label} best: batch={best_row[0]} ({best_row[1]:.1f} img/s)",
                file=sys.stderr,
            )

    # The reference's parity configuration trains MIXED shapes: GTA5 source
    # at 1280x720 + Cityscapes target at 1024x512 (reference config.py:16-21,
    # 227-233). One flagship row at those shapes proves the mixed-resolution
    # step compiles and runs at speed (per-input D/block-mean shapes).
    try:
        t_ips, t_sec, t_flops, _ = _train_throughput(
            "flagship", 8, src_size=(720, 1280), tgt_size=(512, 1024)
        )
        t_mfu = _mfu(t_flops, t_sec)
        mfu_s = f", MFU {t_mfu:.1%}" if t_mfu else ""
        print(
            f"train flagship @ reference shapes (src 1280x720 + tgt "
            f"1024x512, b8): {t_ips:.1f} src img/s "
            f"({t_sec * 1e3:.1f} ms/step{mfu_s})",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"reference-shape flagship row skipped: {e}", file=sys.stderr)

    # int8 PTQ serving path: qualifies as headline only above 0.99 on-device
    # argmax agreement with the bf16 path — probed on the briefly-trained
    # weights from the vanilla timing run (23 steps on a learnable
    # synthetic batch), so both the calibrated activation ranges and the
    # logit structure reflect a trained (if young) network, not PRNGKey(0)
    # and not a random-label-trained one (whose near-uniform logits flip
    # argmax under any noise). The real-data gate is --final_int8_eval
    # (val-set mIoU through the int8 path, train/loop.py).
    try:
        fid_vars = trained_vars if trained_vars is not None else variables
        provenance = (
            "trained weights (23 learnable-synthetic steps)"
            if trained_vars is not None else "random init (fallback)"
        )
        q_vars, q_forward, probe, q_clip = _build_int8(fid_vars)
        a = jnp.argmax(forward(q_vars, probe), -1)
        bq = jnp.argmax(q_forward(q_vars, probe), -1)
        agreement = float(jnp.mean(a == bq))
        print(
            f"int8 argmax agreement vs bf16 on {provenance} "
            f"(clip={q_clip}): {agreement:.4f}",
            file=sys.stderr,
        )
        best_q, best_qb, best_qsec = 0.0, 0, 0.0
        for b in (32, 64, 96, 128):
            devt, _ = _time_batch(q_forward, q_vars, b)
            ips = b / devt
            print(f"int8 batch={b}: {ips:.1f} img/s device", file=sys.stderr)
            if ips > best_q:
                best_q, best_qb, best_qsec = ips, b, devt
        if agreement >= 0.99 and best_q > best_ips:
            # per-image FLOPs from the bf16 analysis, scaled to the int8 batch
            q_mfu = _mfu(infer_flops * best_qb / max(best_b, 1), best_qsec,
                         V5E_PEAK_INT8) if infer_flops else None
            best_ips, best_b = best_q, best_qb
            print(
                f"headline: int8 PTQ batch={best_qb} ({best_q:.1f} img/s"
                + (f", int8 MFU {q_mfu:.1%})" if q_mfu else ")"),
                file=sys.stderr,
            )
    except Exception as e:
        print(f"int8 sweep skipped: {e}", file=sys.stderr)

    # DeepLabV2 upper-bound model inference row.
    try:
        d_ips, d_b, d_mfu = _deeplab_throughput()
        mfu_s = f", MFU {d_mfu:.1%}" if d_mfu else ""
        print(
            f"deeplabv2-r101 bf16 batch={d_b}: {d_ips:.1f} img/s{mfu_s}",
            file=sys.stderr,
        )
    except Exception as e:
        print(f"deeplabv2 row skipped: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "bisenet_r18_infer_images_per_sec_1024x512",
                "value": round(best_ips, 2),
                "unit": "img/s/chip",
                "vs_baseline": round(best_ips / BASELINE_IMG_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
