"""Pallas TPU kernel: fused-im2col 4x4/stride-2 conv for few-channel inputs.

The FC-Discriminator's first conv (19->64, 4x4, stride 2, pad 1, full
resolution; reference ``models/discriminator/discriminator.py:25-60``) is
the one conv XLA's v5e emitter handles badly (~9-13 TFLOP/s) and the
adversarial step evaluates it three times forward plus two backward chains.
Every above-compiler rewrite loses to native (PERFORMANCE.md: shifted
GEMMs, channel padding, flat-reshape im2col all slower) because XLA
materializes the im2col through HBM. This kernel builds it in VMEM:

- **Width packing.** Pad W by 1 on both sides so W+2 is even; the *free*
  row-major reshape ``(H+2, (W+2)/2, 2C)`` turns the stride-2 window into a
  unit-stride window of 2 packed columns, every channel used: the im2col
  contraction is dense, K = 4 rows * 2 packed cols * 2C = 16C.
- **Row halo.** Pallas Blocked indexing cannot overlap blocks, so each grid
  step receives a (2R)-row main block plus the next 2 rows via a second
  (shifted) view of the same padded array.
- Per chunk of output rows: 8 static tap slices are concatenated into a
  ``(chunk*Wo, 16C)`` im2col tile and hit the MXU as ONE GEMM against the
  packed ``(16C, CO)`` kernel.

Weight packing: ``w.reshape(4, 2, 2C, CO)`` groups the 4 kx taps as
(packed-col p, column-parity h) pairs — tap (ky, p) consumes packed channel
(h*C + c) = original (kx=2p+h, c), matching the tap concat order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_kernel(
    xm_ref,  # (1, 2R, Wp, C2) main rows block
    xh_ref,  # (1, 2, Wp, C2) halo rows block
    w_ref,  # (8*C2, CO) packed kernel
    out_ref,  # (1, R, Wo, CO)
    *,
    block_rows: int,
    chunk: int,
    wo: int,
):
    r = block_rows
    c2 = xm_ref.shape[-1]
    main = xm_ref[0]  # (2R, Wp, C2)
    halo = xh_ref[0]  # (2, Wp, C2)
    m = main.reshape(r, 2, main.shape[1], c2)
    # Even/odd padded-row planes for this strip: plane row u holds padded
    # row 2u (even) / 2u+1 (odd); output row i reads plane rows i, i+1.
    even = jnp.concatenate([m[:, 0], halo[0:1]], axis=0)  # (R+1, Wp, C2)
    odd = jnp.concatenate([m[:, 1], halo[1:2]], axis=0)
    wk = w_ref[:].astype(jnp.bfloat16)

    for ci in range(r // chunk):  # static unroll: all slices static
        i0 = ci * chunk
        taps = []
        for ky in range(4):
            plane = even if ky % 2 == 0 else odd
            rows = plane[i0 + ky // 2 : i0 + ky // 2 + chunk]
            for p in range(2):
                taps.append(
                    rows[:, p : p + wo, :].reshape(chunk * wo, c2)
                )
        col = jnp.concatenate(taps, axis=1).astype(jnp.bfloat16)
        acc = jax.lax.dot_general(
            col,
            wk,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (chunk*Wo, CO)
        out_ref[0, pl.ds(i0, chunk)] = acc.reshape(
            chunk, wo, -1
        ).astype(out_ref.dtype)


def _pack_input(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> width-packed padded (B, H+2, (W+2)/2, 2C)."""
    b, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return xp.reshape(b, h + 2, (w + 2) // 2, 2 * c)


def pack_kernel(w: jnp.ndarray) -> jnp.ndarray:
    """(4, 4, C, CO) HWIO -> (16C, CO) in tap-concat order (ky, p, h, c)."""
    kh, kw, c, co = w.shape
    assert (kh, kw) == (4, 4), w.shape
    return w.reshape(4, 2, 2 * c, co).reshape(16 * c, co)


@functools.partial(
    jax.jit,
    static_argnames=("block_rows", "chunk", "out_dtype", "interpret"),
)
def conv4x4s2p1(
    x: jnp.ndarray,  # (B, H, W, C), H and W even
    w: jnp.ndarray,  # (4, 4, C, CO) HWIO
    *,
    block_rows: int = 32,
    chunk: int = 8,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """4x4 stride-2 pad-1 conv, fused-im2col Pallas kernel.

    Equivalent to ``lax.conv_general_dilated(x, w, (2,2), ((1,1),(1,1)),
    NHWC/HWIO)`` with f32 accumulation, output cast to ``out_dtype``.
    """
    b, h, wd, c = x.shape
    assert h % 2 == 0 and wd % 2 == 0, (h, wd)
    ho, wo = h // 2, wd // 2
    block_rows = min(block_rows, ho)
    while ho % block_rows:
        block_rows -= 1
    chunk = min(chunk, block_rows)
    while block_rows % chunk:
        chunk -= 1
    co = w.shape[-1]
    c2 = 2 * c

    xp = _pack_input(x)
    xm = xp[:, :h]  # main strips: 2R rows at offset 2R*r
    xh = xp[:, 2:]  # halo: rows 2R*(r+1), +1 -> offset 2R*(r+1)-2 here
    wf = pack_kernel(w)
    n_r = ho // block_rows
    wp = xp.shape[2]

    kernel = functools.partial(
        _conv_kernel, block_rows=block_rows, chunk=chunk, wo=wo
    )
    return pl.pallas_call(
        kernel,
        grid=(b, n_r),
        in_specs=[
            pl.BlockSpec(
                (1, 2 * block_rows, wp, c2),
                lambda bi, ri: (bi, ri, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 2, wp, c2),
                lambda bi, ri: (bi, block_rows * ri + block_rows - 1, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (16 * c, co), lambda bi, ri: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_rows, wo, co),
            lambda bi, ri: (bi, ri, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, ho, wo, co), out_dtype),
        interpret=interpret,
    )(xm, xh, wf)
