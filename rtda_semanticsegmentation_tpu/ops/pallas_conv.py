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

# v5e has 128 MB of physical VMEM; the Mosaic default scoped limit is 16 MB,
# which the (block + im2col tile + double-buffering) working set exceeds.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _conv_kernel(
    xm_ref,  # (1, 2R, Wp, C2) main rows block
    xh_ref,  # (1, 2, Wp, C2) halo rows block
    w_ref,  # (8*C2, CO) packed kernel
    out_ref,  # (1, R, Wo, CO)
    *,
    block_rows: int,
    chunk: int,
    wo: int,
    fuse_k: bool,
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
        if fuse_k:
            # one dense GEMM; the 8 tap copies into `col` run at C2-lane
            # (sub-128) efficiency — measured slower than native for C=19
            col = jnp.concatenate(taps, axis=1).astype(jnp.bfloat16)
            acc = jax.lax.dot_general(
                col,
                wk,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (chunk*Wo, CO)
        else:
            # copy-free: 8 accumulating K=C2 GEMMs straight off the planes
            # (MXU pads K to 128; trades padded FLOPs for zero VPU copies)
            acc = None
            for q, tap in enumerate(taps):
                part = jax.lax.dot_general(
                    tap.astype(jnp.bfloat16),
                    wk[q * c2 : (q + 1) * c2],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = part if acc is None else acc + part
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
    static_argnames=("block_rows", "chunk", "out_dtype", "interpret", "fuse_k"),
)
def conv4x4s2p1(
    x: jnp.ndarray,  # (B, H, W, C), H and W even
    w: jnp.ndarray,  # (4, 4, C, CO) HWIO
    *,
    block_rows: int = 32,
    chunk: int = 8,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
    fuse_k: bool = False,
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
        _conv_kernel, block_rows=block_rows, chunk=chunk, wo=wo, fuse_k=fuse_k
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
        compiler_params=_COMPILER_PARAMS,
    )(xm, xh, wf)


def _dw_kernel(
    xm_ref,  # (1, 2R, Wp, C2)
    xh_ref,  # (1, 2, Wp, C2)
    dy_ref,  # (1, R, Wo, CO)
    out_ref,  # (16C, CO) f32, shared accumulator across the whole grid
    *,
    block_rows: int,
    chunk: int,
    wo: int,
):
    """dW = im2col(x)^T @ dy, accumulated over the (sequential) TPU grid."""
    bi = pl.program_id(0)
    ri = pl.program_id(1)

    @pl.when(jnp.logical_and(bi == 0, ri == 0))
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    r = block_rows
    c2 = xm_ref.shape[-1]
    main = xm_ref[0]
    halo = xh_ref[0]
    m = main.reshape(r, 2, main.shape[1], c2)
    even = jnp.concatenate([m[:, 0], halo[0:1]], axis=0)
    odd = jnp.concatenate([m[:, 1], halo[1:2]], axis=0)

    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for ci in range(r // chunk):
        i0 = ci * chunk
        taps = []
        for ky in range(4):
            plane = even if ky % 2 == 0 else odd
            rows = plane[i0 + ky // 2 : i0 + ky // 2 + chunk]
            for p in range(2):
                taps.append(rows[:, p : p + wo, :].reshape(chunk * wo, c2))
        col = jnp.concatenate(taps, axis=1).astype(jnp.bfloat16)
        dy = dy_ref[0, pl.ds(i0, chunk)].reshape(chunk * wo, -1)
        acc += jax.lax.dot_general(
            col,
            dy.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[:] += acc


@functools.partial(
    jax.jit, static_argnames=("block_rows", "chunk", "interpret")
)
def conv4x4s2p1_dw(
    x: jnp.ndarray,  # (B, H, W, C)
    dy: jnp.ndarray,  # (B, H/2, W/2, CO)
    *,
    block_rows: int = 32,
    chunk: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
    """Weight gradient of :func:`conv4x4s2p1`; returns (4, 4, C, CO) f32."""
    b, h, wd, c = x.shape
    ho, wo = h // 2, wd // 2
    co = dy.shape[-1]
    block_rows = min(block_rows, ho)
    while ho % block_rows:
        block_rows -= 1
    chunk = min(chunk, block_rows)
    while block_rows % chunk:
        chunk -= 1
    c2 = 2 * c

    xp = _pack_input(x)
    xm = xp[:, :h]
    xh = xp[:, 2:]
    n_r = ho // block_rows
    wp = xp.shape[2]

    kernel = functools.partial(
        _dw_kernel, block_rows=block_rows, chunk=chunk, wo=wo
    )
    wf_grad = pl.pallas_call(
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
                (1, block_rows, wo, co),
                lambda bi, ri: (bi, ri, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (16 * c, co), lambda bi, ri: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((16 * c, co), jnp.float32),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(xm, xh, dy)
    # inverse of pack_kernel: (ky, p, h, c) -> (ky, kx=2p+h, c)
    return wf_grad.reshape(4, 2, 2, c, co).reshape(4, 4, c, co)


def _dx_kernel(
    dym_ref,  # (1, R, Wo, CO) main dy rows [R*ri, R*(ri+1))
    dyb_ref,  # (1, 1, Wo, CO) halo row R*ri - 1 (clamped; masked at ri==0)
    dya_ref,  # (1, 1, Wo, CO) halo row R*(ri+1) (clamped; masked at last)
    w_ref,  # (16C, CO) packed kernel
    out_ref,  # (1, 2R, Wp, C2): dx for padded rows [2R*ri+1, 2R*(ri+1)+1)
    odd_ref,  # (R, Wp, C2) f32 scratch: odd[u] = padded row 2*(R*ri+u)+1
    even_ref,  # (R, Wp, C2) f32 scratch: even[u] = padded row 2*(R*ri+u+1)
    *,
    block_rows: int,
    chunk: int,
    wo: int,
    last_r: int,
):
    """dx of the 4x4/s2 conv: col2im of dy @ w^T, overlap-added in VMEM.

    Output rows are *padded* coordinates shifted by one (the pad row 0 is
    dropped, the bottom pad row H+1 never materializes): out block ri holds
    padded rows [2R*ri + 1, 2R*(ri+1) + 1) == original rows
    [2R*ri, 2R*(ri+1)). Odd padded rows land in the ``odd`` scratch plane,
    even rows in ``even``; dy row i (local li) contributes taps ky=0..3 to
    padded rows 2i+ky. Scratch refs keep the overlap-add in place."""
    ri = pl.program_id(1)
    r = block_rows
    co = w_ref.shape[1]
    c2 = out_ref.shape[3]
    wk = w_ref[:].astype(jnp.bfloat16)  # (16C, CO)

    odd_ref[:] = jnp.zeros_like(odd_ref)
    even_ref[:] = jnp.zeros_like(even_ref)

    before_ok = (ri > 0).astype(jnp.float32)
    after_ok = (ri < last_r).astype(jnp.float32)

    def add_rows(dy_rows, li0, n):
        """Accumulate dcol taps of dy local rows [li0, li0+n). All indices
        are static, so every slice below is a static VMEM update."""
        dcol = jax.lax.dot_general(
            dy_rows.reshape(n * wo, co).astype(jnp.bfloat16),
            wk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (n*Wo, 16C)
        for ky in range(4):
            for p in range(2):
                q = ky * 2 + p
                tap = dcol[:, q * c2 : (q + 1) * c2].reshape(n, wo, c2)
                # padded row 2i+ky; parity ky&1; plane u = i + ky//2
                if ky % 2 == 1:  # odd plane, local index li + ky//2
                    dst0 = li0 + ky // 2
                else:  # even plane, local index li + ky//2 - 1
                    dst0 = li0 + ky // 2 - 1
                ref = odd_ref if ky % 2 == 1 else even_ref
                dst, src0 = max(dst0, 0), -min(dst0, 0)
                take = min(n - src0, r - dst)
                if take > 0:
                    ref[dst : dst + take, p : p + wo, :] += tap[
                        src0 : src0 + take
                    ]

    # halo row before (li = -1): only its ky=3 tap lands in this block
    add_rows(dyb_ref[0].astype(jnp.float32) * before_ok, -1, 1)
    for ci in range(r // chunk):
        add_rows(dym_ref[0, ci * chunk : (ci + 1) * chunk], ci * chunk, chunk)
    # halo row after (li = R): only its ky=0 tap lands here
    add_rows(dya_ref[0].astype(jnp.float32) * after_ok, r, 1)

    # interleave: block rows go odd[0], even[0], odd[1], even[1], ...
    inter = jnp.stack([odd_ref[:], even_ref[:]], axis=1).reshape(
        2 * r, odd_ref.shape[1], c2
    )
    out_ref[0] = inter.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_rows", "chunk", "out_dtype", "interpret"),
)
def conv4x4s2p1_dx(
    dy: jnp.ndarray,  # (B, H/2, W/2, CO)
    w: jnp.ndarray,  # (4, 4, C, CO)
    *,
    block_rows: int = 32,
    chunk: int = 8,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """Input gradient of :func:`conv4x4s2p1`; returns (B, H, W, C)."""
    b, ho, wo, co = dy.shape
    h, wd = 2 * ho, 2 * wo
    c = w.shape[2]
    c2 = 2 * c
    wp = (wd + 2) // 2
    block_rows = min(block_rows, ho)
    while ho % block_rows:
        block_rows -= 1
    chunk = min(chunk, block_rows)
    while block_rows % chunk:
        chunk -= 1
    n_r = ho // block_rows
    wf = pack_kernel(w)

    kernel = functools.partial(
        _dx_kernel,
        block_rows=block_rows,
        chunk=chunk,
        wo=wo,
        last_r=n_r - 1,
    )
    rb = block_rows
    out = pl.pallas_call(
        kernel,
        grid=(b, n_r),
        in_specs=[
            pl.BlockSpec(
                (1, rb, wo, co),
                lambda bi, ri: (bi, ri, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, wo, co),
                lambda bi, ri: (bi, jnp.maximum(ri * rb - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, wo, co),
                lambda bi, ri: (
                    bi,
                    jnp.minimum(ri * rb + rb, ho - 1),
                    0,
                    0,
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (16 * c, co), lambda bi, ri: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 2 * rb, wp, c2),
            lambda bi, ri: (bi, ri, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, wp, c2), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((rb, wp, c2), jnp.float32),
            pltpu.VMEM((rb, wp, c2), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(dy, dy, dy, wf)
    # out rows are padded rows [1, H+1) == original rows [0, H); unpack the
    # width packing and crop the width pad.
    return out.reshape(b, h, wd + 2, c)[:, :, 1 : wd + 1, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def fused_conv4x4s2p1(
    x, w, block_rows=32, chunk=8, out_dtype=jnp.bfloat16, interpret=False
):
    """Differentiable fused 4x4/s2/p1 conv (Pallas fwd + Pallas dW/dx)."""
    return conv4x4s2p1(
        x, w, block_rows=block_rows, chunk=chunk, out_dtype=out_dtype,
        interpret=interpret,
    )


def _fused_fwd(x, w, block_rows, chunk, out_dtype, interpret):
    y = conv4x4s2p1(
        x, w, block_rows=block_rows, chunk=chunk, out_dtype=out_dtype,
        interpret=interpret,
    )
    return y, (x, w)


def _fused_bwd(block_rows, chunk, out_dtype, interpret, res, dy):
    x, w = res
    dw = conv4x4s2p1_dw(
        x, dy, block_rows=block_rows, chunk=chunk, interpret=interpret
    ).astype(w.dtype)
    dx = conv4x4s2p1_dx(
        dy, w, block_rows=block_rows, chunk=chunk, out_dtype=x.dtype,
        interpret=interpret,
    )
    return dx, dw


fused_conv4x4s2p1.defvjp(_fused_fwd, _fused_bwd)
