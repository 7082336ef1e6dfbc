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


def _build():
    from rtda_semanticsegmentation_tpu.config import ExperimentConfig
    from rtda_semanticsegmentation_tpu.models.factory import build_model, init_model

    cfg = ExperimentConfig()
    model = build_model(cfg.model)  # bisenet-resnet18, bf16 compute
    variables = init_model(
        model, jax.random.PRNGKey(0), (1, H, W, 3), train=False
    )

    @jax.jit
    def forward(variables, images):
        return model.apply(variables, images, False)

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
    ring = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (4, batch, H, W, 3), np.uint8)
    ).astype(jnp.bfloat16)

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


def _train_throughput(mode: str = "vanilla", batch: int = 8):
    """(img/s, sec/iter, step FLOPs, final generator variables) of the
    compiled train step for ``mode`` in {'vanilla', 'flagship'}.

    'vanilla' = CE only with the full aug pipeline (reference train.py:28);
    'flagship' = adversarial + Lovasz, the framework's richest mode
    (reference train_lovasz.py:172). The returned variables have seen the
    timing steps' training (~25 steps on synthetic data) — used downstream
    as non-random weights for the int8 fidelity probe.
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
    cfg = cfg.replace(
        data=dataclasses.replace(
            cfg.data, gta5_size=(H, W), cityscapes_size=(H, W)
        ),
        train=dataclasses.replace(cfg.train, batch_size=batch),
    )
    model = build_model(cfg.model)
    g = ModelState.create(
        model.apply,
        init_model(model, jax.random.PRNGKey(0), (1, H, W, 3)),
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
                disc, jax.random.PRNGKey(1), (1, H, W, cfg.model.num_classes)
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
    b = {
        "image": jnp.asarray(rng.randint(0, 256, (batch, H, W, 3), np.uint8)),
        "label": jnp.asarray(rng.randint(0, 19, (batch, H, W), np.int32)),
    }
    if adversarial:
        b["target_image"] = jnp.asarray(
            rng.randint(0, 256, (batch, H, W, 3), np.uint8)
        )
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

    cfg = ModelConfig(name="deeplabv2", context_path="resnet101")
    model = build_model(cfg)
    variables = init_model(
        model, jax.random.PRNGKey(0), (1, H, W, 3), train=False
    )

    @jax.jit
    def forward(variables, images):
        return model.apply(variables, images, False)

    best_ips, best_b, best_sec = 0.0, 0, 0.0
    for b in (8, 16, 32):
        sec, _ = _time_batch(forward, variables, b)
        ips = b / sec
        if ips > best_ips:
            best_ips, best_b, best_sec = ips, b, sec
    x = jnp.zeros((best_b, H, W, 3), jnp.bfloat16)
    flops = xla_flops(lambda v, im: model.apply(v, im, False), variables, x)
    return best_ips, best_b, _mfu(flops, best_sec)


def _build_int8(variables):
    """Calibrated int8-PTQ forward (serving path; see models/quantize.py).

    ``variables`` should be trained (or converted) weights — calibration and
    the downstream fidelity probe are only meaningful on realistic
    activation ranges, not PRNG inits."""
    from rtda_semanticsegmentation_tpu.config import ExperimentConfig
    from rtda_semanticsegmentation_tpu.models.quantize import calibrate, quantized_model

    cfg = ExperimentConfig()
    rng = np.random.RandomState(7)

    def batch():
        return (
            jnp.asarray(rng.randint(0, 256, (4, H, W, 3), np.uint8)) / 255.0
            - 0.45
        ) / 0.225

    variables = calibrate(cfg.model, variables, [batch() for _ in range(3)])
    mq = quantized_model(cfg.model)

    @jax.jit
    def forward(variables, images):
        return mq.apply(variables, images, False)

    # the agreement probe is held out: drawn AFTER the calibration batches,
    # so calibrated activation clipping is actually exercised
    return variables, forward, batch().astype(jnp.bfloat16), cfg.model.quant_clip


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
        _fwd, variables, jnp.zeros((best_b, H, W, 3), jnp.bfloat16)
    )
    mfu = _mfu(infer_flops, best_sec)
    print(
        f"bf16 best: batch={best_b} ({best_ips:.1f} img/s, "
        f"MFU {mfu:.1%})" if mfu else
        f"bf16 best: batch={best_b} ({best_ips:.1f} img/s)",
        file=sys.stderr,
    )

    # Training throughput rows (run BEFORE int8 so the fidelity probe gets
    # trained weights, not PRNG inits): vanilla + flagship, each with MFU.
    trained_vars = None
    for mode, label in (("vanilla", "train vanilla+aug"),
                        ("flagship", "train adversarial+lovasz")):
        try:
            t_ips, t_sec, t_flops, g_vars = _train_throughput(mode)
            t_mfu = _mfu(t_flops, t_sec)
            mfu_s = f", MFU {t_mfu:.1%}" if t_mfu else ""
            print(
                f"{label} (b8): {t_ips:.1f} img/s "
                f"({t_sec * 1e3:.1f} ms/step{mfu_s})",
                file=sys.stderr,
            )
            if mode == "vanilla":
                trained_vars = g_vars
        except Exception as e:
            print(f"{label} skipped: {e}", file=sys.stderr)

    # int8 PTQ serving path: qualifies as headline only above 0.99 on-device
    # argmax agreement with the bf16 path — probed on the briefly-trained
    # weights from the vanilla timing run (25 synthetic steps), so calibrated
    # activation ranges reflect a real (if young) network, not PRNGKey(0).
    try:
        fid_vars = trained_vars if trained_vars is not None else variables
        provenance = (
            "trained weights (25 synthetic steps)"
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
