"""Pallas TPU kernel: 3x3/stride-1/pad-1 conv as 9 accumulating tap GEMMs.

Targets the channel-rich small-spatial convs where XLA's v5e emitter runs
3-6x off roofline (PERFORMANCE.md item 9: 3x3 at <=64x128 spatial runs
15-26 TFLOP/s vs 97 at 256x512 — a flat ~0.7-1 ms floor per conv that
dominates BiSeNet's context path and DeepLabV2's dilated tail). Unlike the
19-channel discriminator conv (where every Pallas formulation lost to the
sub-128-lane operand copies), these layers have C >= 128: every tap slice
is lane-efficient and the 9 GEMMs contract the full channel dim with zero
MXU padding waste:

    out[i, j] = sum_{dy,dx} x[i+dy-1, j+dx-1] @ W[dy, dx]   (C x CO GEMMs)

Each grid step takes a row block plus a 2-row halo (two views of the same
padded array — Blocked indexing cannot overlap), pads nothing in W (the
caller pre-pads once), and accumulates the 9 taps into an f32 block.
Optional fused epilogue: per-channel scale/shift (folded BatchNorm) and
ReLU, saving the elementwise HBM round trip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _conv3_kernel(
    xm_ref,  # (1, R, Wp, C) main padded rows [R*ri, R*(ri+1))
    xh_ref,  # (1, 2, Wp, C) halo padded rows R*(ri+1), +1
    w_ref,  # (9C, CO)
    s_ref,  # (1, CO) scale  (or None)
    b_ref,  # (1, CO) shift  (or None)
    out_ref,  # (1, R, W, CO)
    *,
    relu: bool,
    has_scale: bool,
):
    r = out_ref.shape[1]
    wo = out_ref.shape[2]
    c = xm_ref.shape[-1]
    strip = jnp.concatenate([xm_ref[0], xh_ref[0]], axis=0)  # (R+2, Wp, C)
    wk = w_ref[:].astype(jnp.bfloat16)

    acc = None
    for dy in range(3):
        for dx in range(3):
            q = dy * 3 + dx
            tap = strip[dy : dy + r, dx : dx + wo, :]  # (R, W, C)
            part = jax.lax.dot_general(
                tap.astype(jnp.bfloat16),
                wk[q * c : (q + 1) * c],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (R, W, CO)
            acc = part if acc is None else acc + part
    if has_scale:
        acc = acc * s_ref[0][None, None, :] + b_ref[0][None, None, :]
    if relu:
        acc = jnp.maximum(acc, 0.0)
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_rows", "relu", "out_dtype", "interpret"),
)
def conv3x3s1p1(
    x: jnp.ndarray,  # (B, H, W, C)
    w: jnp.ndarray,  # (3, 3, C, CO) HWIO
    scale: jnp.ndarray | None = None,  # (CO,) folded-BN scale
    shift: jnp.ndarray | None = None,  # (CO,) folded-BN shift
    *,
    block_rows: int = 16,
    relu: bool = False,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """3x3 stride-1 pad-1 conv (+ optional scale/shift/ReLU epilogue).

    Matches ``lax.conv_general_dilated(x, w, (1,1), ((1,1),(1,1)))`` with
    f32 accumulation; ``scale``/``shift`` apply per output channel after
    the conv (folded BatchNorm), then optional ReLU.
    """
    b, h, wd, c = x.shape
    co = w.shape[-1]
    assert h % 2 == 0 and wd % 2 == 0, (h, wd)
    block_rows = min(block_rows, h)
    while h % block_rows or block_rows % 2:
        block_rows -= 1
    assert block_rows >= 2, block_rows

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))  # (B, H+2, W+2, C)
    xm = xp[:, :h]
    xh = xp[:, 2:]  # halo rows R*(ri+1), +1 at offset R*(ri+1)-2 here
    wf = w.reshape(9 * c, co)
    has_scale = scale is not None
    if has_scale:
        s = scale.reshape(1, co).astype(jnp.float32)
        bsh = (
            shift.reshape(1, co).astype(jnp.float32)
            if shift is not None
            else jnp.zeros((1, co), jnp.float32)
        )
    else:
        s = jnp.ones((1, co), jnp.float32)
        bsh = jnp.zeros((1, co), jnp.float32)
    n_r = h // block_rows
    wp = wd + 2
    rb = block_rows

    kernel = functools.partial(
        _conv3_kernel, relu=relu, has_scale=has_scale
    )
    return pl.pallas_call(
        kernel,
        grid=(b, n_r),
        in_specs=[
            pl.BlockSpec(
                (1, rb, wp, c), lambda bi, ri: (bi, ri, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 2, wp, c),
                lambda bi, ri: (bi, (rb * (ri + 1) - 2) // 2, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (9 * c, co), lambda bi, ri: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, co), lambda bi, ri: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, co), lambda bi, ri: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, rb, wd, co), lambda bi, ri: (bi, ri, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, wd, co), out_dtype),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(xm, xh, wf, s, bsh)
