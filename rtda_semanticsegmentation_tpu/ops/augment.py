"""On-device, batched image augmentation.

The reference augments on the host with albumentations inside 16 DataLoader
worker processes (reference ``config.py:115-265``, SURVEY.md section 3.5).
TPU-first redesign: the host ships raw **uint8** NHWC batches (4x less
host->device bandwidth than f32) and the whole augmentation pipeline runs
*inside the jitted train step* — batched, vectorized, keyed by
``jax.random`` — where XLA fuses it with the normalization and the first
convolution's input cast.

Behavioral parity targets (albumentations semantics, distributional — exact
RNG parity with numpy is impossible by construction):

- ColorJitter(brightness=0.3, contrast=0.3, saturation=0.3, hue=0.1, p=0.5):
  torchvision-style factors, the four sub-ops applied in a random order.
- ISONoise(intensity=(0.1,0.3), color_shift=(0.01,0.05), p=0.5): the
  albumentations algorithm — Poisson luminance noise in HLS space scaled by
  the image's L-channel stddev, Gaussian hue shift in degrees.
- CoarseDropout(1-8 holes, 20-60 px, fill=0, p=0.5): holes cut from the
  image only (the mask is untouched, albumentations' default).
- HorizontalFlip(p=0.5): geometric, applied to image AND label. Disabled in
  the default 'all_four_combined' pipeline (the reference comments it out,
  ``config.py:207``).
- Normalize(ImageNet mean/std) always runs last.

All ops are per-image independent (vmap over the batch with split keys).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import AugmentConfig
from .colorspace import hls_to_rgb, hsv_to_rgb, rgb_to_hls, rgb_to_hsv

# ITU-R 601 luma (torchvision); tuple, not jnp array: module import must
# not touch a device backend.
_GRAY_WEIGHTS = (0.299, 0.587, 0.114)


def _blend(a: jnp.ndarray, b: jnp.ndarray, ratio: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(ratio * a + (1.0 - ratio) * b, 0.0, 1.0)


def _brightness(img, factor):
    return jnp.clip(img * factor, 0.0, 1.0)


def _contrast(img, factor):
    mean = jnp.mean(img @ jnp.asarray(_GRAY_WEIGHTS, img.dtype))
    return _blend(img, jnp.full_like(img, mean), factor)


def _saturation(img, factor):
    gray = (img @ jnp.asarray(_GRAY_WEIGHTS, img.dtype))[..., None]
    return _blend(img, jnp.broadcast_to(gray, img.shape), factor)


def _hue(img, shift_frac):
    hsv = rgb_to_hsv(img)
    hsv = hsv.at[..., 0].add(jnp.asarray(shift_frac * 360.0, img.dtype))
    return jnp.clip(hsv_to_rgb(hsv), 0.0, 1.0)


def color_jitter(
    img: jnp.ndarray, key: jax.Array, cfg: AugmentConfig
) -> jnp.ndarray:
    """torchvision/albumentations-style ColorJitter on one (H, W, 3) image
    in [0, 1] (float) or [0, 255] (uint8): the 4 sub-ops run in a uniformly
    random order with factors drawn from the configured ranges.

    Structure: under ``vmap`` a ``lax.switch`` evaluates EVERY branch for
    every image anyway, so each of the 4 sequential steps computes all four
    candidate outputs with hand-shared subexpressions (one gray pass serves
    contrast AND saturation; one HSV round trip serves hue) and picks the
    ordered one with ``lax.select_n`` — the same math as dispatching
    per-op with less duplicate work (A/B in PERFORMANCE.md). The sequential
    dependency itself is irreducible: torchvision's contrast blends with
    the mean gray of the CURRENT intermediate, so each step carries a
    reduction barrier.

    uint8 input: each sequential step materializes uint8 (half the HBM
    traffic of the bf16 chain again; the fori_loop carry IS the
    inter-step barrier buffer) with the step math in f32 on [0, 1] —
    exactly albumentations' own structure, where every transform consumes
    and produces uint8 images (reference ``config.py:204-214``)."""
    u8 = img.dtype == jnp.uint8
    dt = jnp.float32 if u8 else img.dtype
    k_ord, k_b, k_c, k_s, k_h = jax.random.split(key, 5)
    fb = jax.random.uniform(
        k_b, minval=1.0 - cfg.cj_brightness, maxval=1.0 + cfg.cj_brightness
    ).astype(dt)
    fc = jax.random.uniform(
        k_c, minval=1.0 - cfg.cj_contrast, maxval=1.0 + cfg.cj_contrast
    ).astype(dt)
    fs = jax.random.uniform(
        k_s, minval=1.0 - cfg.cj_saturation, maxval=1.0 + cfg.cj_saturation
    ).astype(dt)
    fh = jax.random.uniform(k_h, minval=-cfg.cj_hue, maxval=cfg.cj_hue)
    order = jax.random.permutation(k_ord, 4)

    def apply_op(i, im):
        if u8:
            im = im.astype(jnp.float32) / 255.0
        gray = im @ jnp.asarray(_GRAY_WEIGHTS, im.dtype)
        mean = jnp.mean(gray, dtype=jnp.float32).astype(im.dtype)
        out = jax.lax.select_n(
            order[i],
            _brightness(im, fb),
            _blend(im, jnp.full_like(im, mean), fc),          # contrast
            _blend(im, jnp.broadcast_to(gray[..., None], im.shape), fs),
            _hue(im, fh),
        )
        if u8:
            out = jnp.round(out * 255.0).astype(jnp.uint8)
        return out

    return jax.lax.fori_loop(0, 4, apply_op, img)


def _poisson_approx(key: jax.Array, lam, shape) -> jnp.ndarray:
    """Poisson(lam) via a skew-corrected, integer-rounded Gaussian.

    Exact ``jax.random.poisson`` with a traced rate is ~50x the cost of a
    normal draw in-jit (rejection loops) — too slow for the per-step aug
    path. A plain Gaussian misses Poisson's discreteness and its 1/sqrt(lam)
    skewness, visibly so at the small rates low-intensity ISONoise produces
    (lam ~ 3-8). The Cornish-Fisher second-order correction
    ``lam + sqrt(lam) Z + (Z^2 - 1)/6`` restores the skewness, and rounding
    restores the integer support; clamping at 0 matches the non-negative
    range. Moments vs true Poisson: mean exact, variance lam + ~0.14
    (rounding 1/12 + correction 1/18), skewness 1/sqrt(lam) — KS distance
    to Poisson < 0.02 for lam >= 3 (tests/test_augment_dist.py pins this
    against numpy's true Poisson).
    """
    z = jax.random.normal(key, shape)
    lam = jnp.maximum(lam, 0.0)
    # The CF term is lam-independent, so it must be gated off as lam -> 0
    # (Poisson(0) is exactly 0; a flat image must stay noise-free).
    w = jnp.minimum(lam, 1.0)
    x = lam + jnp.sqrt(lam) * z + w * (z * z - 1.0) / 6.0
    return jnp.maximum(jnp.round(x), 0.0)


def iso_noise(
    img: jnp.ndarray, key: jax.Array, cfg: AugmentConfig
) -> jnp.ndarray:
    """albumentations ISONoise on one (H, W, 3) image in [0, 1] (float) or
    [0, 255] (uint8):
    L += Poisson(std(L) * intensity * 255)/255 * (1 - L);
    H += Normal(0, color_shift * 360 * intensity) degrees.

    Interior math runs in f32 whatever the pipeline dtype: the hue NOISE
    sigma goes down to ~0.4 degrees — below bf16's ~2-degree H resolution —
    and the L-channel std feeds the Poisson rate. A uint8 input rounds back
    to uint8 (albumentations' own u8-in/u8-out contract)."""
    dt = img.dtype
    u8 = dt == jnp.uint8
    img = img.astype(jnp.float32)
    if u8:
        img = img / 255.0
    k_i, k_c, k_pois, k_norm = jax.random.split(key, 4)
    intensity = jax.random.uniform(
        k_i, minval=cfg.iso_intensity[0], maxval=cfg.iso_intensity[1]
    )
    color_shift = jax.random.uniform(
        k_c, minval=cfg.iso_color_shift[0], maxval=cfg.iso_color_shift[1]
    )
    hls = rgb_to_hls(img)
    stddev = jnp.std(hls[..., 1])
    lam = stddev * intensity * 255.0
    pois = _poisson_approx(k_pois, lam, img.shape[:2])
    color_noise = (
        jax.random.normal(k_norm, img.shape[:2]) * color_shift * 360.0 * intensity
    )
    h = (hls[..., 0] + color_noise) % 360.0
    l = jnp.clip(hls[..., 1] + (pois / 255.0) * (1.0 - hls[..., 1]), 0.0, 1.0)
    out = hls_to_rgb(jnp.stack([h, l, hls[..., 2]], axis=-1))
    out = jnp.clip(out, 0.0, 1.0)
    if u8:
        return jnp.round(out * 255.0).astype(jnp.uint8)
    return out.astype(dt)


def coarse_dropout(
    img: jnp.ndarray, key: jax.Array, cfg: AugmentConfig
) -> jnp.ndarray:
    """albumentations CoarseDropout on one (H, W, 3) image: 1..max_holes
    rectangular holes of 20-60 px filled with ``cd_fill``. Static shapes:
    max_holes boxes are always sampled; inactive ones are masked out."""
    h_img, w_img = img.shape[0], img.shape[1]
    k_n, k_h, k_w, k_y, k_x = jax.random.split(key, 5)
    m = cfg.cd_max_holes
    n = jax.random.randint(k_n, (), cfg.cd_min_holes, m + 1)
    lo, hi = cfg.cd_hole_size
    hh = jax.random.randint(k_h, (m,), lo, hi + 1)
    ww = jax.random.randint(k_w, (m,), lo, hi + 1)
    # Clamp holes to the image (albumentations rejects oversized holes; at
    # tiny train sizes an unclamped hole would get a negative origin and
    # blank nearly the whole image).
    hh = jnp.minimum(hh, h_img)
    ww = jnp.minimum(ww, w_img)
    y1 = (
        jax.random.uniform(k_y, (m,)) * jnp.maximum(h_img - hh, 0)
    ).astype(jnp.int32)
    x1 = (
        jax.random.uniform(k_x, (m,)) * jnp.maximum(w_img - ww, 0)
    ).astype(jnp.int32)
    active = jnp.arange(m) < n
    rows = jnp.arange(h_img)[:, None]  # (H, 1)
    cols = jnp.arange(w_img)[None, :]  # (1, W)
    inside = (
        active[:, None, None]
        & (rows[None] >= y1[:, None, None])
        & (rows[None] < (y1 + hh)[:, None, None])
        & (cols[None] >= x1[:, None, None])
        & (cols[None] < (x1 + ww)[:, None, None])
    ).any(axis=0)
    fill = (
        round(cfg.cd_fill * 255.0) if img.dtype == jnp.uint8 else cfg.cd_fill
    )
    return jnp.where(inside[..., None], jnp.asarray(fill, img.dtype), img)


def _maybe(key, p, fn, img):
    apply_it = jax.random.bernoulli(key, p)
    return jax.lax.cond(apply_it, fn, lambda x: x, img)


def normalize(images: jnp.ndarray, cfg: AugmentConfig) -> jnp.ndarray:
    """ImageNet normalization of [0,1] float images (any leading dims).

    Runs at the images' own float dtype, floored at f32 (f64 under the x64
    parity tests; f32 everywhere in production)."""
    dt = jnp.promote_types(images.dtype, jnp.float32)
    mean = jnp.asarray(cfg.norm_mean, dt)
    std = jnp.asarray(cfg.norm_std, dt)
    return (images.astype(dt) - mean) / std


def normalize_u8(
    images_u8: jnp.ndarray, cfg: AugmentConfig, dtype=jnp.float32
) -> jnp.ndarray:
    """uint8 NHWC -> normalized float (the eval / no-aug path)."""
    return normalize(images_u8.astype(dtype) / 255.0, cfg)


def augment_batch(
    images_u8: jnp.ndarray,
    labels: jnp.ndarray,
    key: jax.Array,
    cfg: AugmentConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full train-time pipeline on a uint8 NHWC batch.

    Returns (normalized f32 images, labels) — labels only change under
    horizontal flip. Sub-op order matches the reference's active pipeline:
    [HFlip] -> ColorJitter -> ISONoise -> CoarseDropout -> Normalize
    (reference ``config.py:204-214``).
    """
    hflip, cj, iso, cd = cfg.flags
    b = images_u8.shape[0]

    if hflip:
        # flip the uint8 images before the float conversion: same pixels,
        # 1/4 the HBM traffic of flipping the f32 tensor
        flip = jax.random.bernoulli(jax.random.fold_in(key, 0), cfg.prob, (b,))
        images_u8 = jnp.where(
            flip[:, None, None, None], images_u8[:, :, ::-1, :], images_u8
        )
        labels = jnp.where(flip[:, None, None], labels[:, :, ::-1], labels)

    def per_image(img, k):
        k1, k2, k3 = jax.random.split(k, 3)
        if cj:
            img = _maybe(jax.random.fold_in(k1, 1), cfg.prob,
                         lambda x: color_jitter(x, jax.random.fold_in(k1, 2), cfg), img)
        if iso:
            img = _maybe(jax.random.fold_in(k2, 1), cfg.prob,
                         lambda x: iso_noise(x, jax.random.fold_in(k2, 2), cfg), img)
        if cd:
            img = _maybe(jax.random.fold_in(k3, 1), cfg.prob,
                         lambda x: coarse_dropout(x, jax.random.fold_in(k3, 2), cfg), img)
        return img

    if cj or iso or cd:
        keys = jax.random.split(jax.random.fold_in(key, 1), b)
        # The stochastic chain runs in cfg.aug_dtype (default uint8 — the
        # pipeline is HBM-bandwidth-bound and the reference's albumentations
        # transforms are uint8-in/uint8-out anyway, so the u8 chain is the
        # most reference-faithful AND the cheapest; see
        # AugmentConfig.aug_dtype). Per-op math runs in f32 on [0, 1];
        # stats reductions and ISONoise interiors stay f32 in every mode;
        # the no-op and hflip-only paths stay exact f32.
        dt = jnp.dtype(cfg.aug_dtype)
        if dt == jnp.uint8:
            imgs = jax.vmap(per_image)(images_u8, keys)
            imgs = imgs.astype(jnp.float32) / 255.0
        else:
            imgs = images_u8.astype(jnp.float32) / 255.0
            imgs = jax.vmap(per_image)(imgs.astype(dt), keys).astype(
                jnp.float32
            )
    else:
        imgs = images_u8.astype(jnp.float32) / 255.0

    return normalize(imgs, cfg), labels
