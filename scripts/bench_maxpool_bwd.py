"""Maxpool-backward formulation microbench (closes the last analysis-only
floor claim from the b32 backward profile).

`scripts/profile_backward_ops.py` measured the stem maxpool backward
(`select_and_scatter`, 3x3/s2 on (32,256,512,64)) at 4.47 ms — ~3x its
operand-traffic floor — and the floor attribution rested on ANALYSIS
("first-max semantics rule out cheap equality-split reformulations; a
9-tap overlap-add writes dx 9x"). This measures the alternatives:

  P1 autodiff        — jax.vjp of lax.reduce_window max (production path:
                       XLA select_and_scatter)
  P2 first-max phase — recompute y as the max of 9 strided taps, claim
                       gradient at the FIRST (row-major) tap equal to y
                       (bit-matches torch/select_and_scatter tie routing),
                       assemble dx by 2x2 input-parity interleave: every
                       contribution is written ONCE at window resolution,
                       dx materialized once.
  P3 equality-split  — distribute dy equally to ALL tied maxima (WRONG
                       semantics: speed ceiling probe — if even this cannot
                       beat P1, the direction is dead regardless of tie
                       bookkeeping).

All programs include the forward max (P1's vjp recomputes nothing, so the
fwd-only program P0 is timed too and deltas are reported).

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/bench_maxpool_bwd.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ITERS = 20
CASES = [  # (name, B, H, W, C)  — 3x3/s2/p1 pool (BiSeNet/ResNet stem)
    ("stem_b32", 32, 256, 512, 64),
    ("stem_b8", 8, 256, 512, 64),
]


def maxpool(x):
    neg = -jnp.inf
    return jax.lax.reduce_window(
        x, neg, jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)),
    )


def taps(x_pad, ho, wo):
    """The 9 strided (B, ho, wo, C) window-tap views, row-major order."""
    out = []
    for kh in range(3):
        for kw in range(3):
            out.append(jax.lax.slice(
                x_pad,
                (0, kh, kw, 0),
                (x_pad.shape[0], kh + 2 * (ho - 1) + 1,
                 kw + 2 * (wo - 1) + 1, x_pad.shape[3]),
                (1, 2, 2, 1),
            ))
    return out


def _interleave(a, b, axis):
    """Interleave two equal-shape arrays elementwise along ``axis``."""
    s = jnp.stack([a, b], axis=axis + 1)
    shape = list(a.shape)
    shape[axis] *= 2
    return s.reshape(shape)


def bwd_phase_firstmax(x, dy, equality_split=False):
    """dx of the 3x3/s2/p1 maxpool, contributions written once.

    Padded input is (B, H+2, W+2, C); H+2 is even, so parity phases are
    clean halves. Tap (kh, kw) at window (wr, wc) touches padded row
    2*wr + kh — parity (kh%2, kw%2), phase-row wr + (kh - kh%2)/2.
    """
    B, H, W, C = x.shape
    ho, wo = H // 2, W // 2
    x_pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
    ts = taps(x_pad, ho, wo)
    y = ts[0]
    for t in ts[1:]:
        y = jnp.maximum(y, t)

    dyf = dy
    contribs = []
    if equality_split:
        n = sum((t == y).astype(dy.dtype) for t in ts)
        share = dyf / n
        contribs = [jnp.where(t == y, share, 0) for t in ts]
    else:
        claimed = jnp.zeros(y.shape, jnp.bool_)
        for t in ts:
            eq = (t == y) & ~claimed
            claimed = claimed | eq
            contribs.append(jnp.where(eq, dyf, 0))

    # Per-parity phase accumulation at window resolution. Phase rows span
    # (H+2)/2 = ho+1 rows; tap kh=0 writes phase rows 0..ho-1, kh=2 writes
    # 1..ho (shift 1); kh=1 (odd parity) writes rows 0..ho-1 of ho+1.
    def acc(kh_list, kw_list):
        ph = jnp.zeros((B, ho + 1, wo + 1, C), dy.dtype)
        for kh in kh_list:
            for kw in kw_list:
                c = contribs[kh * 3 + kw]
                dr, dc = kh // 2, kw // 2
                ph = ph.at[:, dr:dr + ho, dc:dc + wo, :].add(c)
        return ph

    ph_ee = acc((0, 2), (0, 2))
    ph_eo = acc((0, 2), (1,))
    ph_oe = acc((1,), (0, 2))
    ph_oo = acc((1,), (1,))

    even_rows = _interleave(ph_ee, ph_eo, axis=2)  # (B, ho+1, 2(wo+1), C)
    odd_rows = _interleave(ph_oe, ph_oo, axis=2)
    full = _interleave(even_rows, odd_rows, axis=1)  # (B, H+2, W+2, C)
    return full[:, 1:H + 1, 1:W + 1, :]


def timed(fn, ring, dy):
    @jax.jit
    def loop(ring, dy, n):
        def body(i, acc):
            return acc + fn(ring[i % 2], dy)

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

    float(loop(ring, dy, 3))
    t0 = time.perf_counter()
    float(loop(ring, dy, ITERS))
    return (time.perf_counter() - t0) / ITERS


def main():
    print(f"device: {jax.devices()[0].device_kind} "
          f"({jax.default_backend()})", flush=True)

    # Correctness first: ties forced via a coarse value grid; dy is
    # integer-valued f32 so multi-window sums are association-independent
    # (bf16/real-valued dy would differ in rounding between the two
    # formulations' accumulation orders without any routing difference).
    key = jax.random.PRNGKey(0)
    xs = jnp.round(jax.random.uniform(key, (2, 32, 64, 8)) * 8).astype(
        jnp.float32)
    dys = jnp.round(jax.random.normal(jax.random.PRNGKey(1),
                                      (2, 16, 32, 8)) * 4)
    _, pull = jax.vjp(maxpool, xs)
    ref = pull(dys)[0]
    got = bwd_phase_firstmax(xs, dys)
    exact = bool(jnp.all(ref == got))
    print(f"first-max phase bwd vs autodiff (tied grid): exact={exact}",
          flush=True)
    assert exact, "tie routing mismatch"

    for name, B, H, W, C in CASES:
        k1, k2 = jax.random.split(jax.random.PRNGKey(42))
        ring = jax.random.normal(k1, (2, B, H, W, C)).astype(jnp.bfloat16)
        dy = jax.random.normal(k2, (B, H // 2, W // 2, C)).astype(
            jnp.bfloat16)

        def p0(x, dy):
            return jnp.sum(maxpool(x)).astype(jnp.float32) * 1e-6

        def p1(x, dy):
            _, pull = jax.vjp(maxpool, x)
            return jnp.sum(pull(dy)[0]).astype(jnp.float32) * 1e-6

        def p2(x, dy):
            return jnp.sum(bwd_phase_firstmax(x, dy)).astype(
                jnp.float32) * 1e-6

        def p3(x, dy):
            return jnp.sum(
                bwd_phase_firstmax(x, dy, equality_split=True)
            ).astype(jnp.float32) * 1e-6

        t0 = timed(p0, ring, dy)
        t1 = timed(p1, ring, dy)
        t2 = timed(p2, ring, dy)
        t3 = timed(p3, ring, dy)
        floor_ms = (ring[0].nbytes + dy.nbytes + ring[0].nbytes) / 819e6
        print(
            f"{name}: fwd {t0*1e3:6.2f} ms | autodiff fwd+bwd {t1*1e3:6.2f}"
            f" (bwd {1e3*(t1-t0):6.2f}) | phase-firstmax {t2*1e3:6.2f}"
            f" (bwd {1e3*(t2-t0):6.2f}) | eq-split {t3*1e3:6.2f}"
            f" (bwd {1e3*(t3-t0):6.2f})   floor ~{floor_ms:.2f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
