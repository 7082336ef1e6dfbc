"""Per-op TPU profile of the vanilla train step — the backward under the
microscope (VERDICT r4 item 3).

Method: compile the b32 vanilla fwd+bwd program (BiSeNet-R18 512x1024, the
same program family as scripts/bench_step_decomposition.py), capture a
jax.profiler trace with create_perfetto_trace=True over several warm steps,
and join the perfetto "XLA Ops" device events with the optimized HLO:

- per-instruction FLOPs for convolutions (shapes parsed from the HLO text,
  including operands resolved by name),
- fwd/bwd classification from jax op_name metadata (backward ops carry
  "transpose(jvp(...))" scopes) plus conv-shape heuristics (dW convs
  produce kernel-shaped outputs; dx convs carry lhs_dilation/reversal).

Output: top-K table (op, count/step, ms/step, % of step, TFLOP/s, class)
plus fwd/bwd/other bucket totals. This replaces the r4 extrapolation
("the backward gap is the thin-stage conv emitter") with measurements.

Env: DECOMP_BATCH (default 32), PROFILE_STEPS (default 4),
PROFILE_PROGRAM = fwdbwd (default) | serve_bf16 | serve_int8 (the
serve-equivalent inference program at DECOMP_BATCH, int8 via the frozen
path under the current default policy).
Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/profile_backward_ops.py
"""

from __future__ import annotations

import dataclasses
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

H, W = 512, 1024
BATCH = int(os.environ.get("DECOMP_BATCH", "32"))
STEPS = int(os.environ.get("PROFILE_STEPS", "4"))
PROGRAM = os.environ.get("PROFILE_PROGRAM", "fwdbwd")
LOGDIR = "/tmp/bwd_profile_trace"
V5E_PEAK_BF16 = 197e12


def build_serve(int8: bool):
    """Serve-equivalent program (bench.py): uint8 -> normalize -> model ->
    argmax-sum (the argmax is added here so the traced program matches the
    timed one)."""
    import bench

    variables, forward = bench._build()
    if int8:
        variables, forward, _, _, _ = bench._build_int8(variables)

    def prog(variables, images):
        out = forward(variables, images)
        return jnp.sum(jnp.argmax(out, -1)).astype(jnp.float32)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 256, (BATCH, H, W, 3), np.uint8))
    return prog, (variables, images)


def build_fwdbwd():
    from rtda_semanticsegmentation_tpu.config import get_preset
    from rtda_semanticsegmentation_tpu.models.factory import build_model, init_model
    from rtda_semanticsegmentation_tpu.ops.augment import normalize_u8
    from rtda_semanticsegmentation_tpu.ops.losses import cross_entropy_with_ignore
    from rtda_semanticsegmentation_tpu.train.optim import build_generator_tx
    from rtda_semanticsegmentation_tpu.train.state import ModelState
    from rtda_semanticsegmentation_tpu.train.steps import _apply_train

    cfg = get_preset("bisenet_source_aug")
    cfg = cfg.replace(
        data=dataclasses.replace(cfg.data, gta5_size=(H, W)),
        train=dataclasses.replace(cfg.train, batch_size=BATCH),
    )
    model = build_model(cfg.model)
    g = ModelState.create(
        model.apply,
        init_model(model, jax.random.PRNGKey(0), (1, H, W, 3)),
        build_generator_tx(cfg.optimizer, 1000),
    )
    rng = np.random.RandomState(0)
    images = normalize_u8(
        jnp.asarray(rng.randint(0, 256, (BATCH, H, W, 3), np.uint8)),
        cfg.augment,
    ).astype(jnp.bfloat16)
    labels = jnp.asarray(rng.randint(0, 19, (BATCH, H, W), np.int32))

    def fwdbwd(params, batch_stats, images, labels):
        def loss_fn(p):
            (logits, _, _), new_bs = _apply_train(g, p, batch_stats, images)
            loss = cross_entropy_with_ignore(logits, labels, 255)
            return loss, new_bs

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        import optax

        leaf = jax.tree_util.tree_leaves(new_bs)[0]
        return loss + optax.global_norm(grads) * 1e-12 + leaf.reshape(-1)[0] * 1e-12

    return fwdbwd, (g.params, g.batch_stats, images, labels)


_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _nelems(ty: str):
    m = _SHAPE_RE.match(ty)
    if not m:
        return None, None
    dims = [int(d) for d in m.group(2).split(",") if d]
    n = 1
    for d in dims:
        n *= d
    return m.group(1), dims


def parse_hlo(txt: str):
    """name -> dict(kind, dims, flops, cls) for top-level + fused convs/dots."""
    # 1) every instruction definition: name -> (type, line)
    defs = {}
    for line in txt.splitlines():
        m = re.match(
            r"\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*((?:\w+\[[\d,]*\])"
            r"(?:\{[^}]*\})?|\([^)]*\))\s*(\w[\w\-]*)\(", line
        )
        if m:
            defs[m.group(1)] = (m.group(2), m.group(3), line)

    def op_flops(name):
        ty, kind, line = defs[name]
        if kind not in ("convolution", "dot"):
            return 0.0
        _, out_dims = _nelems(ty)
        if out_dims is None:
            return 0.0
        ops = re.search(r"\w+\(([^)]*)\)", line)
        operands = [o.strip().lstrip("%") for o in ops.group(1).split(",")] if ops else []
        if kind == "convolution":
            wnd = re.search(r"window=\{[^}]*size=(\d+)x(\d+)", line)
            kh, kw = (int(wnd.group(1)), int(wnd.group(2))) if wnd else (1, 1)
            # ci from the rhs operand's shape + dim_labels
            ci = None
            if len(operands) >= 2 and operands[1] in defs:
                _, rdims = _nelems(defs[operands[1]][0])
                if rdims:
                    # rhs has kh, kw and (ci, co) in some order; divide out
                    n = 1
                    for d in rdims:
                        n *= d
                    co_guess = out_dims[-1]
                    ci = max(1, n // max(kh * kw * co_guess, 1))
            if ci is None:
                ci = 1
            n_out = 1
            for d in out_dims:
                n_out *= d
            return 2.0 * n_out * kh * kw * ci
        # dot: 2 * M*N*K — K from lhs
        if operands and operands[0] in defs:
            _, ldims = _nelems(defs[operands[0]][0])
            n_out = 1
            for d in out_dims:
                n_out *= d
            if ldims:
                nl = 1
                for d in ldims:
                    nl *= d
                k = max(1, nl // max(n_out // max(out_dims[-1], 1), 1))
                return 2.0 * n_out * k
        return 0.0

    # 2) fusion computations: computation name -> conv/dot flops inside
    comp_flops = defaultdict(float)
    cur = None
    for line in txt.splitlines():
        m = re.match(r"%?([\w.\-]+)\s+\([^)]*\)\s*->.*\{\s*$", line)
        if m:
            cur = m.group(1)
            continue
        if line.startswith("}"):
            cur = None
            continue
        if cur:
            m2 = re.match(
                r"\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*\S+\s+(convolution|dot)\(",
                line,
            )
            if m2 and m2.group(1) in defs:
                comp_flops[cur] += op_flops(m2.group(1))

    # 3) top-level: per-instruction info
    info = {}
    for name, (ty, kind, line) in defs.items():
        fl = op_flops(name) if kind in ("convolution", "dot") else 0.0
        if kind == "fusion":
            mcall = re.search(r"calls=%?([\w.\-]+)", line)
            if mcall:
                fl = comp_flops.get(mcall.group(1), 0.0)
        meta = re.search(r'op_name="([^"]*)"', line)
        op_name = meta.group(1) if meta else ""
        is_bwd = "transpose" in op_name
        cls = "bwd" if is_bwd else "fwd"
        if kind == "convolution":
            _, out_dims = _nelems(ty)
            if out_dims and np.prod(out_dims) < 4e6 and out_dims[0] <= 16:
                cls += ":dW?"
            elif "lhs_dilation" in line or "rhs_reversal" in line:
                cls += ":dx?"
        info[name] = dict(kind=kind, flops=fl, cls=cls, op_name=op_name[:90])
    return info


def main() -> None:
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform}) batch={BATCH} "
          f"program={PROGRAM}", flush=True)
    if PROGRAM == "fwdbwd":
        fwdbwd, args = build_fwdbwd()
    else:
        sys.path.insert(0, "/root/repo")
        fwdbwd, args = build_serve(int8=PROGRAM == "serve_int8")
    step = jax.jit(fwdbwd)
    compiled = step.lower(*args).compile()
    hlo = compiled.as_text()
    with open("/tmp/fwdbwd_hlo.txt", "w") as fh:
        fh.write(hlo)
    info = parse_hlo(hlo)
    print(f"HLO parsed: {len(info)} instructions "
          f"({sum(1 for i in info.values() if i['flops'])} with flops)",
          flush=True)

    float(step(*args))  # warm
    os.makedirs(LOGDIR, exist_ok=True)
    jax.profiler.start_trace(LOGDIR, create_perfetto_trace=True)
    for _ in range(STEPS):
        out = step(*args)
    float(out)
    jax.profiler.stop_trace()

    perfetto = sorted(glob.glob(f"{LOGDIR}/**/*.json.gz", recursive=True))
    perfetto = [p for p in perfetto if "perfetto" in p or "trace" in p]
    with gzip.open(perfetto[-1], "rt") as fh:
        trace = json.load(fh)
    events = trace.get("traceEvents", [])
    # device pid: process named /device:TPU:0; tid of "XLA Ops"
    dev_pid, ops_tid, mod_tid = None, None, None
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            if "TPU" in str(e.get("args", {}).get("name", "")):
                dev_pid = e["pid"]
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name" and e.get("pid") == dev_pid:
            nm = e.get("args", {}).get("name", "")
            if nm == "XLA Ops":
                ops_tid = e["tid"]
            elif nm == "XLA Modules":
                mod_tid = e["tid"]
    agg = defaultdict(lambda: [0, 0.0])  # name -> [count, total_us]
    step_us = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") != dev_pid:
            continue
        if e.get("tid") == ops_tid:
            nm = e.get("name", "").lstrip("%")
            agg[nm][0] += 1
            agg[nm][1] += float(e.get("dur", 0))
        elif e.get("tid") == mod_tid:
            step_us += float(e.get("dur", 0))
    step_us /= max(STEPS, 1)
    print(f"module time/step: {step_us/1e3:.2f} ms; {len(agg)} distinct ops",
          flush=True)

    rows = []
    for nm, (cnt, tot) in agg.items():
        us = tot / STEPS
        i = info.get(nm, {})
        fl = i.get("flops", 0.0)
        rows.append((
            us, nm, cnt / STEPS, i.get("kind", "?"), i.get("cls", "?"),
            fl, i.get("op_name", ""),
        ))
    rows.sort(reverse=True)
    print(f"\n{'ms/step':>8s} {'%':>5s} {'n':>3s} {'TF/s':>6s}  class  op",
          flush=True)
    for us, nm, cnt, kind, cls, fl, op_name in rows[:30]:
        tf = fl / (us * 1e-6) / 1e12 if fl and us else 0.0
        print(f"{us/1e3:8.3f} {us/step_us*100 if step_us else 0:5.1f} "
              f"{cnt:3.0f} {tf:6.1f}  {cls:7s} {nm} | {op_name}", flush=True)

    buckets = defaultdict(float)
    bucket_fl = defaultdict(float)
    for us, nm, cnt, kind, cls, fl, op_name in rows:
        base = cls.split(":")[0]
        buckets[base] += us
        bucket_fl[base] += fl
    print("\nbucket totals:", flush=True)
    for k in sorted(buckets, key=lambda k: -buckets[k]):
        mfu = bucket_fl[k] / (buckets[k] * 1e-6) / V5E_PEAK_BF16 if buckets[k] else 0
        print(f"  {k:5s} {buckets[k]/1e3:8.2f} ms  "
              f"(cost-analysis MFU {mfu:.1%})", flush=True)


if __name__ == "__main__":
    main()
