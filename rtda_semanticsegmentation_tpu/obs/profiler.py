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
    blocks: int = 10,
) -> Dict[str, float]:
    """Latency of fn(variables, x) via the compiled-loop protocol.

    ``iterations`` forwards run inside compiled ``lax.fori_loop`` blocks over
    a 2-entry input ring (index-dependent, so nothing is hoisted), one scalar
    fetch per block — a per-iteration host fetch would measure transport RTT
    on relayed runners (see PERFORMANCE.md), the reference's
    ``torch.cuda.synchronize`` analog being free only on local devices.
    std/p50 are over the per-block means."""
    variables, x = args
    ring = jnp.stack([x, x + jnp.ones_like(x)])

    @jax.jit
    def loop(variables, ring, n):
        def body(i, acc):
            xi = jax.lax.dynamic_index_in_dim(ring, i % 2, keepdims=False)
            out = jax.tree.leaves(fn(variables, xi))[0]
            return acc + jnp.sum(out.astype(jnp.float32))

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    float(loop(variables, ring, max(warmup, 1)))
    # Mean from ONE block of all iterations (host round-trip amortized to
    # RTT/iterations); spread from smaller sub-blocks.
    t0 = time.perf_counter()
    float(loop(variables, ring, iterations))
    mean_s = (time.perf_counter() - t0) / iterations
    per_block = max(1, iterations // blocks)
    block_means = []
    for _ in range(blocks):
        t0 = time.perf_counter()
        float(loop(variables, ring, per_block))
        block_means.append((time.perf_counter() - t0) / per_block)
    t = np.asarray(block_means)
    return {
        "mean_latency_ms": float(mean_s * 1e3),
        "std_latency_ms": float(t.std() * 1e3),
        "p50_latency_ms": float(np.percentile(t, 50) * 1e3),
        "mean_fps": float(1.0 / mean_s),
        "std_fps": float(t.std() / (mean_s**2)),
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
