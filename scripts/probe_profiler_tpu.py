"""Probe: does jax.profiler produce device-side op events over the axon
remote-TPU relay, and what do the perfetto event names look like?

Round-5 groundwork for the backward per-op profile (VERDICT r4 item 3): the
plan is jax.profiler.start_trace(..., create_perfetto_trace=True) -> parse
the perfetto JSON for per-op device durations -> join with compiled-HLO conv
shapes. This probe runs a tiny conv fwd+bwd, captures one trace, and prints
a sample of the device track events so the parser can be written against
reality instead of guesses.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_profiler_tpu.py
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

LOGDIR = "/tmp/profile_probe"


def main() -> None:
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})", flush=True)

    w1 = jnp.asarray(np.random.RandomState(0).randn(3, 3, 64, 128), jnp.float32)
    w2 = jnp.asarray(np.random.RandomState(2).randn(3, 3, 128, 64), jnp.float32)
    x = jnp.asarray(np.random.RandomState(1).randn(8, 64, 128, 64), jnp.bfloat16)

    def loss(w, x):
        w1_, w2_ = w
        y = jax.lax.conv_general_dilated(
            x, w1_.astype(jnp.bfloat16), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = jax.nn.relu(y)
        y2 = jax.lax.conv_general_dilated(
            y, w2_.astype(jnp.bfloat16), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.sum(y2.astype(jnp.float32) ** 2)
    w1 = (w1, w2)

    step = jax.jit(jax.value_and_grad(loss))
    v, g = step(w1, x)
    float(v)  # warm + compile
    print("warmed; starting trace", flush=True)

    os.makedirs(LOGDIR, exist_ok=True)
    try:
        jax.profiler.start_trace(LOGDIR, create_perfetto_trace=True)
        for _ in range(3):
            v, g = step(w1, x)
        float(v)
        jax.profiler.stop_trace()
    except Exception as e:  # noqa: BLE001
        print(f"TRACE FAILED: {type(e).__name__}: {e}", flush=True)
        return

    files = sorted(glob.glob(f"{LOGDIR}/**/*", recursive=True))
    for f in files:
        if os.path.isfile(f):
            print(f"  {os.path.getsize(f):>10d}  {f}", flush=True)

    perfetto = [f for f in files if f.endswith(".json.gz")]
    if not perfetto:
        print("no perfetto json.gz produced", flush=True)
        return
    with gzip.open(perfetto[-1], "rt") as fh:
        trace = json.load(fh)
    events = trace.get("traceEvents", trace if isinstance(trace, list) else [])
    print(f"perfetto events: {len(events)}", flush=True)
    # process/thread name metadata tells us which track is the device
    names = [e for e in events if e.get("ph") == "M"]
    for e in names[:40]:
        print(f"  META {e.get('name')}: pid={e.get('pid')} tid={e.get('tid')} "
              f"args={e.get('args')}", flush=True)
    dur_events = [e for e in events if e.get("ph") == "X" and "dur" in e]
    print(f"complete (X) events: {len(dur_events)}", flush=True)
    # sample: longest 25
    for e in sorted(dur_events, key=lambda e: -e["dur"])[:25]:
        print(f"  X dur={e['dur']:>8d}us pid={e.get('pid')} tid={e.get('tid')} "
              f"name={e.get('name')!r} args_keys={list((e.get('args') or {}))}",
              flush=True)


if __name__ == "__main__":
    main()
