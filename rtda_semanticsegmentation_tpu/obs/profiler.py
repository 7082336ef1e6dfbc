"""Performance profiling: params, analytic FLOPs, compiled-step latency.

Counterpart of reference ``utils.py:292-382`` ``calculate_performance_metrics``
(fvcore FLOP counting + CUDA-synced latency loop), TPU-native:

- FLOPs come from XLA's own cost analysis of the compiled executable
  (``jit(...).lower(...).compile().cost_analysis()``) — the compiler's
  ground truth, not an operator-table estimate.
- Latency uses a scalar device->host fetch per iteration as the
  synchronization point (a data dependency the runtime cannot skip), with
  the reference's 10-warmup / 100-iteration protocol (``config.py:112-113``).
- ``jax.profiler`` trace hooks for timeline inspection.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def xla_flops(fn: Callable, *args) -> Optional[float]:
    """Total FLOPs of the compiled fn per XLA cost analysis (None if the
    backend doesn't report them)."""
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0]
        return float(cost.get("flops")) if cost else None
    except Exception:
        return None


def timed_latency(
    fn: Callable,
    *args,
    iterations: int = 100,
    warmup: int = 10,
) -> Dict[str, float]:
    """mean/std/p50 latency of fn(*args) with forced per-iter completion."""
    jit_fn = jax.jit(
        lambda *a: jnp.sum(jnp.asarray(jax.tree.leaves(fn(*a))[0], jnp.float32))
    )
    for _ in range(warmup):
        float(jit_fn(*args))
    times = []
    for _ in range(iterations):
        t0 = time.perf_counter()
        float(jit_fn(*args))
        times.append(time.perf_counter() - t0)
    t = np.asarray(times)
    return {
        "mean_latency_ms": float(t.mean() * 1e3),
        "std_latency_ms": float(t.std() * 1e3),
        "p50_latency_ms": float(np.percentile(t, 50) * 1e3),
        "mean_fps": float(1.0 / t.mean()),
        "std_fps": float(t.std() / (t.mean() ** 2)),
    }


def performance_metrics(
    apply_fn: Callable,
    variables,
    height: int = 512,
    width: int = 1024,
    iterations: int = 100,
    warmup: int = 10,
    dtype=jnp.bfloat16,
) -> Dict[str, Any]:
    """The reference's end-of-run report dict (``utils.py:292-382``):
    flops_g, params_m, mean/std latency ms, mean/std FPS — measured on the
    eval forward at the benchmark resolution, batch 1."""
    images = jnp.zeros((1, height, width, 3), dtype)

    def forward(variables, images):
        return apply_fn(variables, images, False)

    flops = xla_flops(forward, variables, images)
    lat = timed_latency(
        forward, variables, images, iterations=iterations, warmup=warmup
    )
    return {
        "flops_g": round(flops / 1e9, 2) if flops else None,
        "params_m": round(count_params(variables["params"]) / 1e6, 2),
        **{k: round(v, 3) for k, v in lat.items()},
    }


@contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler timeline trace around a block (view with TensorBoard
    or xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
