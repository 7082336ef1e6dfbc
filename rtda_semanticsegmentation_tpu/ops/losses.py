"""Segmentation and adversarial losses, shape-static and jit-compatible.

Counterparts of the reference's loss surface:

- :func:`cross_entropy_with_ignore` == ``nn.CrossEntropyLoss(ignore_index=255)``
  (reference ``main.py:296-302``), channel-last logits.
- :func:`lovasz_softmax` == ``losses/lovasz_loss.py:76-200`` (the flat
  per-batch "present classes" variant). The reference iterates
  ``torch.unique(labels)`` and boolean-masks pixels — both shape-dynamic and
  untraceable. This version is exactly equivalent but shape-static: every one
  of the C classes is processed (absent classes masked out of the final mean),
  and ignored pixels are excluded by giving them a sort key below any real
  error so they land *after* all valid pixels in the descending error order,
  with their error contribution zeroed. Because every valid position precedes
  every invalid one, the Lovasz-gradient cumulative sums at valid positions
  are untouched — the dot product is bit-for-bit the same sum as the
  reference's masked computation (up to float summation order).
- :func:`bce_with_logits` == ``nn.BCEWithLogitsLoss()``
  (reference ``main_adversarial.py:238-240``), numerically-stable form.

All math runs in float32 regardless of input dtype (models compute in bf16 on
the MXU; losses are reductions and belong in f32).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy_with_ignore(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_index: int = 255,
    reduction: str = "mean",
) -> jnp.ndarray:
    """Softmax cross-entropy over channel-last logits with an ignore label.

    Args:
      logits: (..., C) raw scores (any float dtype; upcast to f32).
      labels: (...) integer class ids; ``ignore_index`` pixels contribute
        nothing and are excluded from the denominator (torch
        ``CrossEntropyLoss(ignore_index=..., reduction='mean')`` semantics).
      reduction: 'mean' (over all valid pixels in the batch — the reference's
        train-time semantics), 'mean_per_image' (mean over valid pixels of
        each leading-axis element, then mean of those — the reference's
        batch-1 validation loop semantics, ``validation.py:89-92``, kept exact
        for batched eval), or 'none' (per-pixel losses, 0 at ignored pixels).
    """
    logits = logits.astype(jnp.promote_types(logits.dtype, jnp.float32))
    num_classes = logits.shape[-1]
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0).astype(jnp.int32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    # One-hot contraction instead of take_along_axis: the gather's backward
    # is a per-pixel scatter, which serializes on TPU (~65 ms at 4M pixels,
    # measured); the one-hot multiply-reduce differentiates to an
    # elementwise product.
    onehot = jax.nn.one_hot(safe_labels, num_classes, dtype=logits.dtype)
    true_logit = (logits * onehot).sum(axis=-1)
    pixel_loss = jnp.where(valid, logz - true_logit, 0.0)
    if reduction == "none":
        return pixel_loss
    if reduction == "mean":
        denom = jnp.maximum(valid.sum(), 1)
        return pixel_loss.sum() / denom
    if reduction == "mean_per_image":
        b = pixel_loss.shape[0]
        per_img_sum = pixel_loss.reshape(b, -1).sum(axis=1)
        per_img_cnt = jnp.maximum(valid.reshape(b, -1).sum(axis=1), 1)
        return (per_img_sum / per_img_cnt).mean()
    raise ValueError(f"unknown reduction {reduction!r}")


def lovasz_softmax(
    probas: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_index: int | None = 255,
    classes: str = "present",
    class_chunk: int | None = None,
) -> jnp.ndarray:
    """Lovasz-Softmax loss (flat, batch-level) — a direct mIoU surrogate.

    Args:
      probas: (..., C) softmax probabilities, channel-last.
      labels: (...) integer ground truth with optional ``ignore_index``.
      classes: 'present' averages only over classes present among valid
        pixels (the reference's mode); 'all' averages over every class.
      class_chunk: how many classes to sort per XLA sort call. The per-class
        sorts are independent, so they run as ONE batched sort over a
        (chunk, P) array — on TPU this is several times faster than C
        sequential sorts (each a serial O(P log P) kernel). ``None`` sorts
        all C classes in one call; lower it to bound the O(chunk*P) sort
        workspace at very large P.

    Numerics identical to the reference's per-present-class loop
    (``lovasz_loss.py:142-183``): ignored pixels get a sort key below any
    real error so they land after all valid pixels, with zero contribution.
    """
    if classes not in ("present", "all"):
        raise ValueError(f"classes must be 'present' or 'all', got {classes!r}")
    num_classes = probas.shape[-1]
    acc = jnp.promote_types(probas.dtype, jnp.float32)
    probas = probas.reshape(-1, num_classes).astype(acc)
    labels = labels.reshape(-1).astype(jnp.int32)
    chunk = num_classes if class_chunk is None else min(class_chunk, num_classes)
    if num_classes % chunk:
        raise ValueError(f"class_chunk {chunk} must divide C={num_classes}")

    if ignore_index is not None:
        valid = labels != ignore_index
    else:
        valid = jnp.ones_like(labels, dtype=bool)
    validf = valid.astype(acc)

    def class_block(carry, cs):
        """cs: (chunk,) class ids; one batched sort for the whole block."""
        loss_sum, present_cnt = carry
        p = probas.T[cs]  # (chunk, P)
        fg = (labels[None, :] == cs[:, None]).astype(acc) * validf
        errors = jnp.abs(fg - p) * validf
        # Descending sort on errors with invalid pixels forced to the tail:
        # sort ascending on -key, invalid key = -1 < 0 <= any valid error.
        key = -jnp.where(valid[None, :], errors, -1.0)
        _, errors_sorted, fg_sorted = jax.lax.sort(
            (key, errors, fg), dimension=1, num_keys=1
        )
        gts = fg.sum(axis=1, keepdims=True)  # (chunk, 1)
        intersection = gts - jnp.cumsum(fg_sorted, axis=1)
        union = gts + jnp.cumsum(1.0 - fg_sorted, axis=1)
        jaccard = 1.0 - intersection / union
        grad = jnp.concatenate(
            [jaccard[:, :1], jaccard[:, 1:] - jaccard[:, :-1]], axis=1
        )
        loss_c = (errors_sorted * grad).sum(axis=1)  # (chunk,)
        if classes == "present":
            present = (gts[:, 0] > 0).astype(acc)
        else:
            present = jnp.ones_like(loss_c)
        return (
            loss_sum + (loss_c * present).sum(),
            present_cnt + present.sum(),
        ), None

    cs_blocks = jnp.arange(num_classes).reshape(-1, chunk)
    (loss_sum, present_cnt), _ = jax.lax.scan(
        class_block, (jnp.zeros((), acc), jnp.zeros((), acc)), cs_blocks
    )
    # Empty mean -> 0 (reference mean(..., empty=0), lovasz_loss.py:19-44).
    return jnp.where(present_cnt > 0, loss_sum / jnp.maximum(present_cnt, 1.0), 0.0)


def _radix_factors(bins: int) -> tuple[int, int]:
    """Factor the bin count into two near-square radices (k1 * k2 == bins)."""
    if bins <= 0 or bins & (bins - 1):
        raise ValueError(f"lovasz bins must be a power of two, got {bins}")
    k1 = 1
    while k1 * k1 < bins:
        k1 *= 2
    return k1, bins // k1


def _binned_hists_xla(probas_t, labels, valid, bins):
    """(C, 3, bins) [count, fg, error_sum] histograms, pure-XLA radix path.

    Radix histogram: bucket = coarse * k2 + fine, so the K-bin histogram is
    the outer product of two small one-hots summed over pixels — a
    (3*k1, P) @ (P, k2) GEMM with k1 + k2 compares per pixel instead of K:
    16x fewer VPU ops than a flat K-wide one-hot. bf16 GEMM operands: counts
    and fg are 0/1 (exact in bf16) and the error column only shapes the
    per-bucket MEAN error, where bf16's ~0.4% element rounding is far under
    the 1/bins bucket width; accumulation is f32 (exact counting to 2^24).
    """
    num_classes = probas_t.shape[0]
    k1, k2 = _radix_factors(bins)
    iota1 = jnp.arange(k1, dtype=jnp.int32)
    iota2 = jnp.arange(k2, dtype=jnp.int32)
    validf = valid.astype(jnp.float32)

    def per_class(_, c):
        p_c = probas_t[c]
        fg = (labels == c).astype(jnp.float32) * validf
        e = jnp.abs(fg - p_c) * validf
        b = jnp.clip((e * bins).astype(jnp.int32), 0, bins - 1)
        c1 = jnp.where(valid, b // k2, -1)
        c2 = b % k2
        oh1 = (c1[None, :] == iota1[:, None]).astype(jnp.bfloat16)  # (k1,P)
        oh2 = (c2[:, None] == iota2[None, :]).astype(jnp.bfloat16)  # (P,k2)
        vals = jnp.stack([validf, fg, e], axis=0).astype(jnp.bfloat16)
        lhs = (oh1[None] * vals[:, None, :]).reshape(3 * k1, -1)  # (3k1, P)
        hist = jax.lax.dot_general(
            lhs, oh2,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(3, bins)
        return None, hist

    _, hists = jax.lax.scan(per_class, None, jnp.arange(num_classes))
    return hists  # (C, 3, bins)


# Test hook: force the Pallas kernels (interpret mode) off-TPU so the
# shard_map SPMD wrapping below is exercisable on the virtual CPU mesh.
FORCE_PALLAS_INTERPRET = False


def _use_pallas() -> tuple[bool, bool]:
    """(use_pallas_kernels, interpret_mode)."""
    if jax.default_backend() == "tpu":
        return True, False
    return FORCE_PALLAS_INTERPRET, FORCE_PALLAS_INTERPRET


def _pixel_sharded(pmesh, data_axis: str) -> bool:
    return pmesh is not None and pmesh.shape.get(data_axis, 1) > 1


def _hist_pallas(probas_t, labels, bins, ignore, pmesh, data_axis):
    """Pallas histogram, per-shard under shard_map when pixels are sharded.

    A bare ``pallas_call`` under SPMD gets *replicated* by the partitioner
    (every chip all-gathers the full pixel set — measured on the 8-device
    mesh: output spec becomes fully replicated). Histograms are pixel-sums,
    so each shard bins its local pixels and a psum over ``data`` restores
    the exact global histogram.
    """
    from .pallas_lovasz import lovasz_radix_hist

    _, interpret = _use_pallas()
    if not _pixel_sharded(pmesh, data_axis):
        return lovasz_radix_hist(
            probas_t, labels, bins, ignore, interpret=interpret
        )
    from jax.sharding import PartitionSpec as P

    def local(p, l):
        h = lovasz_radix_hist(p, l, bins, ignore, interpret=interpret)
        return jax.lax.psum(h, data_axis)

    return jax.shard_map(
        local,
        mesh=pmesh,
        in_specs=(P(None, data_axis), P(data_axis)),
        out_specs=P(None, None, None),
        check_vma=False,  # pallas outputs carry no vma info
    )(probas_t, labels)


def _bwd_pallas(probas_t, labels, coef, bins, ignore, pmesh, data_axis,
                interp=False):
    """Pallas radix backward, per-shard when pixels are sharded.

    The gradient is pointwise given the (replicated) global coef table(s),
    so no collective is needed — each shard produces its pixel columns."""
    from .pallas_lovasz import lovasz_radix_bwd

    _, interpret = _use_pallas()
    if not _pixel_sharded(pmesh, data_axis):
        return lovasz_radix_bwd(
            probas_t, labels, coef, bins, ignore, interp=interp,
            interpret=interpret,
        )
    from jax.sharding import PartitionSpec as P

    def local(p, l, ct):
        return lovasz_radix_bwd(
            p, l, ct, bins, ignore, interp=interp, interpret=interpret
        )

    coef_spec = P(*(None,) * coef.ndim)
    return jax.shard_map(
        local,
        mesh=pmesh,
        in_specs=(P(None, data_axis), P(data_axis), coef_spec),
        out_specs=P(None, data_axis),
        check_vma=False,  # pallas outputs carry no vma info
    )(probas_t, labels, coef)


def _binned_lovasz_forward(
    probas, labels, ignore_index, classes, bins, pmesh=None, data_axis="data",
    interp=False,
):
    """Per-class counting-sort Lovász: returns (loss, tables, present).

    ``interp=False``: tables is coef_table (C, bins), where coef_table[c, k]
    is dL_c/d(error of a pixel of class-c in bucket k)
    = DeltaJaccard(bucket)/count(bucket) — the bucket-averaged Lovász
    gradient used by the custom backward.

    ``interp=True``: tables is (C, 2, bins) holding the FG/BG-SPLIT
    per-bucket coefficients (coef_fg, coef_bg). Measured anatomy of the
    ~0.94 grad-cosine floor (round 5; not bucket width — 128 to 1024
    bins barely moves it, and not sort ties — a tie-averaged exact oracle
    has cosine 1.000 with the exact sort): the exact per-rank Lovász
    coefficient is BIMODAL BY FG-NESS. A descending step onto a foreground
    pixel moves intersection and both cumulative terms of the union
    together, giving ΔJ = 1/U; a step onto a background pixel only grows
    the union, giving ΔJ = I/(U(U+1)) — smaller by the factor I/U < 1. The
    bucket average ΔJ/n mixes the two populations, and that mixing error is
    bin-width-independent because fg and bg errors overlap densely. The
    backward, however, KNOWS each pixel's fg-ness — so each bucket stores
    its two branch coefficients evaluated at the bucket's rank-span
    MIDPOINT (uniform-mixing continuum: I(t) = I0 - f·t,
    U(t) = U0 + (n-f)·t, at t = 1/2):

        coef_fg = 1 / U(1/2)          coef_bg = I(1/2) / U(1/2)²

    and each pixel selects its branch — one extra k2-wide radix reduce vs
    the bucket-average lookup, no per-pixel divisions. (A full rational
    within-bucket interpolation in the pixel's fractional error position
    was built first and measured: it costs 7.4 ms/flagship-step and moves
    the cosine by < 1e-4 vs this midpoint form — the fg/bg SPLIT is the
    entire win, so the cheap form is the shipped one.) Degenerate buckets
    (n == 0, or U0 == 0 — the absent-class first-bucket delta under the
    baseline-0 convention) fall back to the averaged coefficient in both
    branches.

    Histogram producer: a fused single-pass Pallas kernel on TPU
    (``pallas_lovasz.lovasz_radix_hist``) that reads the probability matrix
    and labels once for all classes; the XLA radix scan elsewhere.
    """
    if classes not in ("present", "all"):
        raise ValueError(f"classes must be 'present' or 'all', got {classes!r}")
    num_classes = probas.shape[-1]
    # One contiguous transpose to (C, P): per-class rows then stream at full
    # bandwidth; slicing columns of (P, C) instead costs ~C x the traffic
    # (strided reads pull whole cache lines per element) — measured 3x on
    # the whole loss at C=19.
    probas_t = probas.reshape(-1, num_classes).T.astype(jnp.float32)
    labels = labels.reshape(-1).astype(jnp.int32)

    if ignore_index is not None:
        valid = labels != ignore_index
        ignore = ignore_index
    else:
        valid = jnp.ones_like(labels, dtype=bool)
        ignore = -1
    if _use_pallas()[0]:
        hists = _hist_pallas(
            probas_t, labels, bins, ignore, pmesh, data_axis
        )
    else:
        hists = _binned_hists_xla(probas_t, labels, valid, bins)

    # Vectorized Lovász post-processing over (C, bins) in descending error.
    n = hists[:, 0, ::-1]
    f = hists[:, 1, ::-1]
    se = hists[:, 2, ::-1]
    gts = f.sum(axis=1, keepdims=True)  # (C, 1) total fg per class
    cn = jnp.cumsum(n, axis=1)
    cf = jnp.cumsum(f, axis=1)
    intersection = gts - cf
    union = gts + cn - cf
    # Empty-prefix Jaccard is 0 (the exact construction's implicit baseline:
    # lovasz_grad keeps grad[0] = jaccard[0], i.e. a step from 0). union==0
    # happens only for ABSENT classes on buckets before any pixel appears;
    # defining those as 1 (the old max(union,1) guard alone) pinned the
    # absent-class unit delta onto bucket 0 — almost always empty, where
    # inv_n kills it — silently zeroing the absent-class loss/grad under
    # classes='all'. With baseline 0 the delta lands on the first NONEMPTY
    # bucket: loss_c = mean error there ~= max p_c, matching the exact sort
    # formulation within 1/bins. Present classes have union >= gts > 0
    # everywhere, so their math is unchanged.
    jaccard = jnp.where(
        union > 0, 1.0 - intersection / jnp.maximum(union, 1.0), 0.0
    )
    delta = jnp.concatenate(
        [jaccard[:, :1], jaccard[:, 1:] - jaccard[:, :-1]], axis=1
    )
    inv_n = jnp.where(n > 0, 1.0 / jnp.maximum(n, 1.0), 0.0)
    coef_desc = delta * inv_n  # dloss_c/de for a pixel in that bucket
    loss_c = (se * coef_desc).sum(axis=1)  # (C,)
    if classes == "present":
        present = (gts[:, 0] > 0).astype(jnp.float32)
    else:
        present = jnp.ones_like(loss_c)
    loss_sum = (loss_c * present).sum()
    present_cnt = present.sum()
    loss = jnp.where(
        present_cnt > 0, loss_sum / jnp.maximum(present_cnt, 1.0), 0.0
    )
    if interp:
        # FG/BG-split per-bucket coefficients at the rank-span midpoint
        # (docstring math): exclusive descending cumulatives at each
        # bucket's high-error edge, advanced half a bucket.
        cn0 = cn - n
        cf0 = cf - f
        um = gts + (cn0 - cf0) + 0.5 * (n - f)  # U(1/2)
        im = gts - cf0 - 0.5 * f  # I(1/2)
        ok = (n > 0) & ((cn0 - cf0 + gts) > 0)
        ums = jnp.maximum(um, 0.5)
        c_fg = jnp.where(ok, 1.0 / ums, coef_desc)
        c_bg = jnp.where(ok, im / (ums * ums), coef_desc)
        tables = jnp.stack(
            [c_fg[:, ::-1] * present[:, None],
             c_bg[:, ::-1] * present[:, None]], axis=1
        )  # (C, 2, bins), ascending bucket order
        return loss, tables, present_cnt
    # ascending bucket order so coef_table[c, b] indexes by raw bucket id
    coef_table = coef_desc[:, ::-1] * present[:, None]
    return loss, coef_table, present_cnt


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def lovasz_softmax_binned(
    probas: jnp.ndarray,
    labels: jnp.ndarray,
    ignore_index: int | None = 255,
    classes: str = "present",
    bins: int = 256,
    pmesh=None,
    data_axis: str = "data",
    interp: bool = True,
) -> jnp.ndarray:
    """Lovász-Softmax via counting sort — the TPU-fast formulation.

    The exact loss needs each class's errors in descending order; on TPU an
    XLA sort of 4M pixels costs ~60 ms and 19 classes push the train step
    past 1.2 s (measured, v5e). This variant bins the errors into ``bins``
    equal-width buckets and processes buckets in descending order: within a
    bucket every pixel is assigned the bucket's *mean* error, so the bucket's
    contribution telescopes to ``mean_error * (J_end - J_start)`` with the
    Jaccard index computed from cumulative (count, foreground) totals —
    exactly the Lovász sum if all pixels in a bucket shared one error. The
    per-bucket (count, fg, error-sum) triples come from one fused one-hot
    GEMM per class on the MXU (~27 ms for 19 classes x 4M pixels — 50x the
    sort path).

    Approximation error is bounded by the within-bucket error spread
    (<= 1/bins); measured fidelity is far tighter and nearly independent of
    the bin count (scripts/check_lovasz_bins_accuracy.py: max |loss delta|
    ~4e-5 and grad cosine 0.939-0.945 from 128 to 1024 bins — the cosine
    floor comes from the binning construction, not bucket width). The
    default 256 trades nothing measurable for ~6% of flagship step time vs
    1024 (v5e, scripts/bench_deeplab_scaling_and_bins.py).

    Gradient (custom VJP): dL/de of a pixel comes from a per-bucket table —
    with ``interp=True`` (default) the FG/BG-SPLIT midpoint coefficients
    (fg: 1/U; bg: I/U², per bucket), each pixel selecting its branch,
    which removes the dominant binning-gradient error (the exact
    coefficient is bimodal by fg-ness — see ``_binned_lovasz_forward``);
    with ``interp=False`` the bucket's DeltaJaccard/count average — then
    the analytic de/dp = (1 - 2*fg) chain. Either way the lookup is a
    radix bilinear form: no sort, no scatter, no large residuals in the
    backward.
    """
    loss, _, _ = _binned_lovasz_forward(
        probas, labels, ignore_index, classes, bins, pmesh, data_axis, interp
    )
    return loss


def _binned_fwd(
    probas, labels, ignore_index, classes, bins, pmesh, data_axis, interp
):
    loss, tables, present_cnt = _binned_lovasz_forward(
        probas, labels, ignore_index, classes, bins, pmesh, data_axis, interp
    )
    return loss, (probas, labels, tables, present_cnt)


def _binned_bwd(ignore_index, classes, bins, pmesh, data_axis, interp, res, g):
    probas, labels, coef_table, present_cnt = res
    shape = probas.shape
    num_classes = shape[-1]
    probas_t = probas.reshape(-1, num_classes).T.astype(jnp.float32)  # (C,P)
    labels2 = labels.reshape(-1).astype(jnp.int32)
    if ignore_index is not None:
        valid = labels2 != ignore_index
    else:
        valid = jnp.ones_like(labels2, dtype=bool)
    validf = valid.astype(jnp.float32)
    scale = jnp.where(present_cnt > 0, g / jnp.maximum(present_cnt, 1.0), 0.0)
    # cotangent + normalization fold into the coefficient table(s) —
    # both split branches are coefficients, so the fold is uniform
    coef_table = coef_table * scale
    if _use_pallas()[0]:
        # Fused Pallas backward: per-chunk bilinear radix lookup + chain,
        # no (k?, P) HBM intermediates (pallas_lovasz.lovasz_radix_bwd) —
        # per data shard under shard_map on multi-chip meshes (_bwd_pallas),
        # interpret mode off-TPU.
        cols = _bwd_pallas(
            probas_t,
            labels2,
            coef_table,
            bins,
            ignore_index if ignore_index is not None else -1,
            pmesh,
            data_axis,
            interp,
        )
        dprobas = cols.T.reshape(shape).astype(probas.dtype)
        return dprobas, jnp.zeros(labels.shape, dtype=jax.dtypes.float0)
    k1, k2 = _radix_factors(bins)
    iota1 = jnp.arange(k1, dtype=jnp.int32)
    iota2 = jnp.arange(k2, dtype=jnp.int32)

    def per_class(_, c):
        p_c = probas_t[c]
        fg = (labels2 == c).astype(jnp.float32) * validf
        e = jnp.abs(fg - p_c) * validf
        bqf = e * bins
        b = jnp.clip(bqf.astype(jnp.int32), 0, bins - 1)
        b = jnp.where(valid, b, -1)
        # Radix coef lookup, no per-pixel gathers: coef[c1, c2] realized as
        # the bilinear form oh1 @ coef_matrix selected by oh2 — a (k2, k1) x
        # (k1, P) GEMM plus a k2-wide masked reduce per pixel.
        c1 = jnp.where(valid, b // k2, -1)
        c2 = b % k2
        oh1 = (c1[None, :] == iota1[:, None]).astype(jnp.bfloat16)  # (k1,P)
        oh2 = (c2[None, :] == iota2[:, None]).astype(jnp.bfloat16)  # (k2,P)
        if interp:
            # one dot fetches both branch tables: column blocks of k2 each
            mats = (
                coef_table[c].reshape(2, k1, k2)
                .transpose(1, 0, 2).reshape(k1, 2 * k2)
                .astype(jnp.bfloat16)
            )
            tmp = jax.lax.dot_general(
                mats.T, oh1,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (2*k2, P)
            cfg_v = (tmp[:k2] * oh2).sum(axis=0)
            cbg_v = (tmp[k2:] * oh2).sum(axis=0)
            coef = jnp.where(fg > 0, cfg_v, cbg_v)
        else:
            coef_mat = coef_table[c].reshape(k1, k2).astype(jnp.bfloat16)
            tmp = jax.lax.dot_general(
                coef_mat.T, oh1,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (k2, P)
            coef = (tmp * oh2).sum(axis=0)
        # de/dp = (1 - 2*fg): e = 1-p on foreground, e = p elsewhere
        return None, coef * (1.0 - 2.0 * fg)

    _, cols = jax.lax.scan(per_class, None, jnp.arange(num_classes))
    dprobas = cols.T.reshape(shape).astype(probas.dtype)
    dlabels = jnp.zeros(labels.shape, dtype=jax.dtypes.float0)
    return dprobas, dlabels


lovasz_softmax_binned.defvjp(_binned_fwd, _binned_bwd)


def bce_with_logits(
    logits: jnp.ndarray, targets: jnp.ndarray | float
) -> jnp.ndarray:
    """Mean binary cross-entropy with logits (stable formulation).

    Equivalent to torch ``BCEWithLogitsLoss()`` with a broadcast target —
    the reference always uses constant maps ``full_like(logits, 0 or 1)``
    (``train.py:252-278``)."""
    x = logits.astype(jnp.promote_types(logits.dtype, jnp.float32))
    z = jnp.broadcast_to(jnp.asarray(targets, x.dtype), x.shape)
    loss = jnp.maximum(x, 0.0) - x * z + jnp.log1p(jnp.exp(-jnp.abs(x)))
    return loss.mean()
