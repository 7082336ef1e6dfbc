"""Pallas TPU kernel: fused per-class radix histograms for binned Lovász.

The XLA formulation of the binned Lovász loss (``losses.py``) runs a scan of
19 per-class passes, each re-reading the labels and streaming its probability
row through one-hot GEMMs. This kernel fuses the whole thing into ONE pass:
each grid step loads a pixel chunk of the (C, P) probability matrix and the
labels once, and for every class accumulates the (3, k1, k2) radix histogram
[count, foreground, error-sum] into a VMEM-resident accumulator via MXU dots.

Output: (C * 3 * k1, k2) f32 — reshaped by the caller to (C, 3, bins).

Used by ``lovasz_softmax_binned`` as the forward histogram producer on TPU;
the pure-XLA path remains as fallback (and the numerics oracle in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_CHUNK = 8192


def _hist_kernel(
    probas_ref,  # (C, T) f32 VMEM block
    labels_ref,  # (1, T) i32 VMEM block
    out_ref,  # (C * 3 * k1, k2) f32 VMEM accumulator (same block all steps)
    *,
    num_classes: int,
    k1: int,
    k2: int,
    ignore_index: int,
):
    step = pl.program_id(0)
    bins = k1 * k2

    @pl.when(step == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    labels = labels_ref[0, :]  # (T,)
    valid = labels != ignore_index
    t = labels.shape[0]
    rows1 = jax.lax.broadcasted_iota(jnp.int32, (k1, t), 0)
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (k2, t), 0)

    def per_class(c, _):
        p_c = probas_ref[c, :]  # (T,)
        # labels == c is self-masking: the ignore id (255) never equals a
        # class id, and invalid pixels are dropped via c1 = -1 below, so no
        # separate validity multiplies are needed on fg / the count row.
        fg = (labels == c).astype(jnp.float32)
        e = jnp.abs(fg - p_c)
        b = jnp.clip((e * bins).astype(jnp.int32), 0, bins - 1)
        c1 = jnp.where(valid, b // k2, -1)
        c2 = b % k2
        oh1 = (c1[None, :] == rows1).astype(jnp.bfloat16)  # (k1, T)
        # oh2 is built (k2, T) — T on the 128-lane minor axis — and the dot
        # contracts BOTH operands' dim 1. A (T, k2=32) layout puts 32 on the
        # lanes, wasting 3/4 of every vreg/tile: measured 3.5x slower for
        # the whole kernel (scripts/bench_lovasz_kernel_variants.py,
        # 48 -> 14 ms at b8 512x1024x19).
        oh2 = (c2[None, :] == rows2).astype(jnp.bfloat16)  # (k2, T)
        lhs = jnp.concatenate(
            [
                oh1,
                oh1 * fg[None, :].astype(jnp.bfloat16),
                oh1 * e[None, :].astype(jnp.bfloat16),
            ],
            axis=0,
        )  # (3*k1, T)
        part = jax.lax.dot_general(
            lhs,
            oh2,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (3*k1, k2)
        row = c * (3 * k1)
        out_ref[pl.ds(row, 3 * k1), :] += part
        return _

    jax.lax.fori_loop(0, num_classes, per_class, None)


@functools.partial(jax.jit, static_argnames=("bins", "ignore_index", "chunk", "interpret"))
def lovasz_radix_hist(
    probas_t: jnp.ndarray,  # (C, P) f32
    labels: jnp.ndarray,  # (P,) i32
    bins: int = 1024,
    ignore_index: int = 255,
    chunk: int = DEFAULT_CHUNK,
    interpret: bool = False,
) -> jnp.ndarray:
    """(C, 3, bins) f32 histograms: [count, fg, error_sum] per error bucket.

    Pixels are processed in ``chunk``-sized blocks; P is padded to a multiple
    with ignore labels (zero contribution). Buckets are ascending in error;
    the Lovász post-processing reverses them.
    """
    from .losses import _radix_factors

    num_classes, p = probas_t.shape
    k1, k2 = _radix_factors(bins)
    pad = (-p) % chunk
    if pad:
        probas_t = jnp.pad(probas_t, ((0, 0), (0, pad)))
        labels = jnp.pad(
            labels, (0, pad), constant_values=jnp.int32(ignore_index)
        )
    total = probas_t.shape[1]
    grid = total // chunk

    kernel = functools.partial(
        _hist_kernel,
        num_classes=num_classes,
        k1=k1,
        k2=k2,
        ignore_index=ignore_index,
    )
    out = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(
                (num_classes, chunk),
                lambda i: (0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (num_classes * 3 * k1, k2),
            lambda i: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((num_classes * 3 * k1, k2), jnp.float32),
        interpret=interpret,
    )(probas_t.astype(jnp.float32), labels.reshape(1, -1).astype(jnp.int32))
    return out.reshape(num_classes, 3, bins)


def _bwd_kernel(
    probas_ref,  # (C, T) f32 VMEM block
    labels_ref,  # (1, T) i32 VMEM block
    coef_ref,  # (C * k1, n_tab * k2) f32 VMEM (same block all steps)
    out_ref,  # (C, T) f32 VMEM block
    *,
    num_classes: int,
    k1: int,
    k2: int,
    ignore_index: int,
    interp: bool,
):
    """d(loss)/d(probas) for the binned Lovász, fused per chunk.

    Per pixel of class row c: the per-bucket table row(s) are looked up as
    the bilinear form oh1^T · coef_mat · oh2 (two lane-major small dots —
    see PERFORMANCE.md item 13), then the analytic chain de/dp = (1-2*fg).
    ``interp=False``: one table, the bucket-average coefficient.
    ``interp=True``: two tables (coef_fg, coef_bg) laid out as k2-wide
    column blocks; each pixel selects its fg/bg branch of the split
    midpoint coefficient (``losses._binned_lovasz_forward`` docstring).
    The caller folds the upstream cotangent and the 1/present_count
    normalization into both tables.
    """
    bins = k1 * k2
    labels = labels_ref[0, :]
    valid = labels != ignore_index
    t = labels.shape[0]
    rows1 = jax.lax.broadcasted_iota(jnp.int32, (k1, t), 0)
    rows2 = jax.lax.broadcasted_iota(jnp.int32, (k2, t), 0)

    def per_class(c, _):
        p_c = probas_ref[c, :]
        fg = (labels == c).astype(jnp.float32)
        e = jnp.abs(fg - p_c)
        bqf = e * bins
        b = jnp.clip(bqf.astype(jnp.int32), 0, bins - 1)
        c1 = jnp.where(valid, b // k2, -1)  # -1: invalid pixels get coef 0
        c2 = b % k2
        oh1 = (c1[None, :] == rows1).astype(jnp.bfloat16)  # (k1, T)
        oh2 = (c2[None, :] == rows2).astype(jnp.bfloat16)  # (k2, T)
        coef_mat = coef_ref[pl.ds(c * k1, k1), :].astype(jnp.bfloat16)
        tmp = jax.lax.dot_general(
            coef_mat, oh1,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (n_tab * k2, T)
        oh2f = oh2.astype(jnp.float32)
        if interp:
            cfg_v = jnp.sum(tmp[:k2] * oh2f, axis=0)  # (T,)
            cbg_v = jnp.sum(tmp[k2:] * oh2f, axis=0)
            coef = jnp.where(fg > 0, cfg_v, cbg_v)
        else:
            coef = jnp.sum(tmp * oh2f, axis=0)  # (T,)
        out_ref[c, :] = coef * (1.0 - 2.0 * fg)
        return _

    jax.lax.fori_loop(0, num_classes, per_class, None)


@functools.partial(
    jax.jit,
    static_argnames=("bins", "ignore_index", "chunk", "interp", "interpret"),
)
def lovasz_radix_bwd(
    probas_t: jnp.ndarray,  # (C, P) f32
    labels: jnp.ndarray,  # (P,) i32
    coef_table: jnp.ndarray,  # (C, bins) or (C, 2, bins) f32 (see below)
    bins: int = 1024,
    ignore_index: int = 255,
    chunk: int = DEFAULT_CHUNK,
    interp: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """(C, P) f32 gradient of the binned Lovász w.r.t. probas_t.

    ``interp=False``: ``coef_table`` is (C, bins) bucket-average
    coefficients, cotangent+normalization folded in. ``interp=True``:
    (C, 2, bins) holding (A, rho) per bucket — cotangent folded into A —
    for the within-bucket interpolated coefficient A/(1 + rho*t)².
    """
    from .losses import _radix_factors

    num_classes, p = probas_t.shape
    k1, k2 = _radix_factors(bins)
    pad = (-p) % chunk
    if pad:
        probas_t = jnp.pad(probas_t, ((0, 0), (0, pad)))
        labels = jnp.pad(
            labels, (0, pad), constant_values=jnp.int32(ignore_index)
        )
    total = probas_t.shape[1]
    kernel = functools.partial(
        _bwd_kernel,
        num_classes=num_classes,
        k1=k1,
        k2=k2,
        ignore_index=ignore_index,
        interp=interp,
    )
    if interp:
        # (C, 2, bins) -> (C*k1, 2*k2): per class-row block, k2-wide column
        # blocks (coef_fg, coef_bg), so ONE dot fetches both tables
        tab = (
            coef_table.reshape(num_classes, 2, k1, k2)
            .transpose(0, 2, 1, 3)
            .reshape(num_classes * k1, 2 * k2)
        )
    else:
        tab = coef_table.reshape(num_classes * k1, k2)
    n_tab = 2 if interp else 1
    out = pl.pallas_call(
        kernel,
        grid=(total // chunk,),
        in_specs=[
            pl.BlockSpec(
                (num_classes, chunk), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (num_classes * k1, n_tab * k2),
                lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (num_classes, chunk), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((num_classes, total), jnp.float32),
        interpret=interpret,
    )(
        probas_t.astype(jnp.float32),
        labels.reshape(1, -1).astype(jnp.int32),
        tab.astype(jnp.float32),
    )
    return out[:, :p]
