"""Pallas TPU kernels: s8 convolutions with the int8 serving epilogue fused.

Round-5 evidence (``scripts/probe_int8_chain_hlo.py``, v5e optimized HLO):
XLA already keeps inter-conv activations of the frozen int8 path in s8 —
the dequant→BN→ReLU→requantize elementwise chain fuses into one
clamp_convert fusion — but each ``lax.conv_general_dilated(...,
preferred_element_type=int32)`` MATERIALIZES ITS RAW s32 ACCUMULATOR in HBM
(4 B/elem written + read back by the epilogue fusion), and the padded s8
operand is written a second time by a separate pad fusion. At BiSeNet
shapes that is ~336 B of HBM traffic per 128-channel output element chain
vs ~268 for the bf16 path — the structural reason int8 serving only beat
bf16 by 8% end-to-end in round 4 despite the MXU's 2x s8 rate.

These kernels run the conv on the MXU in s8 x s8 -> s32 with the ENTIRE
serving epilogue in VMEM:

    z   = acc_s32 * A + B          # A = sw [* bn_scale], B = c [* ..] + ..
    z   = max(z, 0)                # optional ReLU
    out = clip(round(z / s_out), 0, 254) - 127   # optional requantize
        (or out = z.astype(bf16) at chain boundaries)

so the only HBM traffic is s8 in + s8 (or bf16) out. The tap-GEMM
structure mirrors ``pallas_conv3.py`` (9 accumulating C x CO GEMMs per
row-block, 2-row halo as a second view); channel-rich shapes (C >= 64)
keep every operand lane-efficient. Input codes must already be on the
conv's unsigned input grid with ZERO-CODE (-127) padding — the flax chain
(``models/layers.py``) guarantees both.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _epilogue(acc, a_ref, b_ref, inv_ref, *, relu, requant, out_dtype):
    """Shared fused epilogue: s32 accum -> scaled/shifted (+ReLU)
    (+requantized) output block. All per-output-channel vectors are f32."""
    z = acc.astype(jnp.float32) * a_ref[0][None, None, :] + (
        b_ref[0][None, None, :]
    )
    if relu:
        z = jnp.maximum(z, 0.0)
    if requant:
        q = jnp.round(z * inv_ref[0][None, None, :])
        q = jnp.clip(q, 0.0, 254.0) - 127.0
        return q.astype(jnp.int8)
    return z.astype(out_dtype)


def _conv3_s8_kernel(
    xm_ref,  # (1, R, Wp, C) s8 main padded rows
    xh_ref,  # (1, 2, Wp, C) s8 halo rows
    w_ref,  # (9C, CO) s8
    a_ref,  # (1, CO) f32 dequant scale (BN folded)
    b_ref,  # (1, CO) f32 shift (zero-point + bias corr + BN folded)
    inv_ref,  # (1, CO) f32 1/s_out for the requantize (ones if unused)
    out_ref,  # (1, R, W, CO) s8 or bf16
    *,
    relu: bool,
    requant: bool,
):
    r = out_ref.shape[1]
    wo = out_ref.shape[2]
    c = xm_ref.shape[-1]
    strip = jnp.concatenate([xm_ref[0], xh_ref[0]], axis=0)  # (R+2, Wp, C)
    wk = w_ref[:]

    acc = None
    for dy in range(3):
        for dx in range(3):
            q = dy * 3 + dx
            tap = strip[dy : dy + r, dx : dx + wo, :]  # (R, W, C) s8
            part = jax.lax.dot_general(
                tap,
                wk[q * c : (q + 1) * c],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # (R, W, CO) s32
            acc = part if acc is None else acc + part
    out_ref[0] = _epilogue(
        acc, a_ref, b_ref, inv_ref,
        relu=relu, requant=requant, out_dtype=out_ref.dtype,
    )


@functools.partial(
    jax.jit,
    static_argnames=("block_rows", "relu", "out_dtype", "interpret"),
)
def int8_conv3x3s1p1(
    xq: jnp.ndarray,  # (B, H, W, C) s8 codes (unsigned grid, zp at -127)
    wq: jnp.ndarray,  # (3, 3, C, CO) s8 HWIO
    a: jnp.ndarray,  # (CO,) f32 fused dequant scale
    b: jnp.ndarray,  # (CO,) f32 fused shift
    inv_out: jnp.ndarray | None = None,  # (CO,) f32 1/s_out => s8 output
    *,
    block_rows: int = 16,
    relu: bool = True,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """3x3 stride-1 pad-1 s8 conv with the fused serving epilogue.

    Matches ``lax.conv_general_dilated(xq_padded, wq, (1,1), VALID,
    preferred_element_type=int32)`` followed by ``acc*a + b`` [-> ReLU]
    [-> unsigned requantize] — with the s32 accumulator never leaving VMEM.
    ``inv_out`` given => returns s8 codes on the next conv's input grid
    (requires ``relu=True``: the unsigned grid assumes z >= 0).
    """
    bsz, h, wd, c = xq.shape
    co = wq.shape[-1]
    requant = inv_out is not None
    if requant and not relu:
        raise ValueError("requantized (s8) output requires relu=True")
    assert h % 2 == 0 and wd % 2 == 0, (h, wd)
    block_rows = min(block_rows, h)
    while h % block_rows or block_rows % 2:
        block_rows -= 1
    assert block_rows >= 2, block_rows

    xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)),
                 constant_values=jnp.int8(-127))
    xm = xp[:, :h]
    xh = xp[:, 2:]
    wf = wq.reshape(9 * c, co)
    af = a.reshape(1, co).astype(jnp.float32)
    bf = b.reshape(1, co).astype(jnp.float32)
    invf = (
        inv_out.reshape(1, co).astype(jnp.float32)
        if requant else jnp.ones((1, co), jnp.float32)
    )
    n_r = h // block_rows
    wp = wd + 2
    rb = block_rows
    kernel = functools.partial(
        _conv3_s8_kernel, relu=relu, requant=requant
    )
    return pl.pallas_call(
        kernel,
        grid=(bsz, n_r),
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
            pl.BlockSpec(
                (1, co), lambda bi, ri: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, rb, wd, co), lambda bi, ri: (bi, ri, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (bsz, h, wd, co), jnp.int8 if requant else out_dtype
        ),
        interpret=interpret,
        compiler_params=_COMPILER_PARAMS,
    )(xm, xh, wf, af, bf, invf)
