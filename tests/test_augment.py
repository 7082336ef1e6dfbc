"""On-device augmentation pipeline tests."""

import colorsys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtda_semanticsegmentation_tpu.config import AugmentConfig
from rtda_semanticsegmentation_tpu.ops.augment import (
    augment_batch,
    coarse_dropout,
    color_jitter,
    iso_noise,
    normalize_u8,
)
from rtda_semanticsegmentation_tpu.ops.colorspace import (
    hls_to_rgb,
    hsv_to_rgb,
    rgb_to_hls,
    rgb_to_hsv,
)


def test_hsv_roundtrip_and_colorsys_parity():
    rng = np.random.default_rng(0)
    rgb = rng.random((64, 3)).astype(np.float32)
    hsv = np.asarray(rgb_to_hsv(jnp.array(rgb)))
    back = np.asarray(hsv_to_rgb(jnp.array(hsv)))
    np.testing.assert_allclose(back, rgb, atol=1e-5)
    for i in range(0, 64, 7):
        h, s, v = colorsys.rgb_to_hsv(*rgb[i])
        assert hsv[i, 0] == pytest.approx(h * 360.0, abs=1e-3)
        assert hsv[i, 1] == pytest.approx(s, abs=1e-5)
        assert hsv[i, 2] == pytest.approx(v, abs=1e-5)


def test_hls_roundtrip_and_colorsys_parity():
    rng = np.random.default_rng(1)
    rgb = rng.random((64, 3)).astype(np.float32)
    hls = np.asarray(rgb_to_hls(jnp.array(rgb)))
    back = np.asarray(hls_to_rgb(jnp.array(hls)))
    np.testing.assert_allclose(back, rgb, atol=1e-5)
    for i in range(0, 64, 7):
        h, l, s = colorsys.rgb_to_hls(*rgb[i])
        assert hls[i, 0] == pytest.approx(h * 360.0, abs=1e-3)
        assert hls[i, 1] == pytest.approx(l, abs=1e-5)
        assert hls[i, 2] == pytest.approx(s, abs=1e-5)


def test_color_jitter_identity_when_ranges_zero():
    cfg = AugmentConfig(cj_brightness=0, cj_contrast=0, cj_saturation=0, cj_hue=0)
    img = jnp.array(np.random.default_rng(2).random((16, 16, 3)), jnp.float32)
    out = color_jitter(img, jax.random.PRNGKey(0), cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)


def test_color_jitter_changes_image_and_stays_in_range():
    cfg = AugmentConfig()
    img = jnp.array(np.random.default_rng(3).random((32, 32, 3)), jnp.float32)
    out = np.asarray(color_jitter(img, jax.random.PRNGKey(1), cfg))
    assert not np.allclose(out, np.asarray(img))
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_iso_noise_perturbs_within_range():
    cfg = AugmentConfig()
    img = jnp.array(np.random.default_rng(8).random((32, 32, 3)), jnp.float32)
    out = np.asarray(iso_noise(img, jax.random.PRNGKey(0), cfg))
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert np.abs(out - np.asarray(img)).mean() > 1e-3  # noise applied
    # luminance noise is additive toward white: mean must not decrease
    assert out.mean() >= np.asarray(img).mean() - 1e-3


def test_iso_noise_flat_image_is_noise_free():
    # stddev(L) == 0 on a constant image -> zero Poisson rate -> no noise
    # (albumentations scales the luminance noise by the L-channel stddev).
    cfg = AugmentConfig()
    img = jnp.full((16, 16, 3), 0.5, jnp.float32)
    out = np.asarray(iso_noise(img, jax.random.PRNGKey(0), cfg))
    np.testing.assert_allclose(out, 0.5, atol=1e-4)


def test_coarse_dropout_zeroes_rectangles():
    cfg = AugmentConfig()
    img = jnp.ones((128, 128, 3), jnp.float32)
    out = np.asarray(coarse_dropout(img, jax.random.PRNGKey(4), cfg))
    zeros = (out == 0.0).all(axis=-1).sum()
    assert zeros >= 20 * 20  # at least one min-size hole
    assert zeros <= 8 * 60 * 60  # at most max_holes of max size
    # holes are axis-aligned rectangles: zero rows/cols form contiguous runs
    assert (out[out != 0] == 1.0).all()


def test_augment_batch_no_aug_is_pure_normalize():
    cfg = AugmentConfig(pipeline="no_new_aug")
    rng = np.random.default_rng(5)
    imgs = rng.integers(0, 256, (2, 8, 8, 3), dtype=np.uint8)
    labels = rng.integers(0, 19, (2, 8, 8)).astype(np.int32)
    out, out_labels = augment_batch(
        jnp.array(imgs), jnp.array(labels), jax.random.PRNGKey(0), cfg
    )
    want = np.asarray(normalize_u8(jnp.array(imgs), cfg))
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out_labels), labels)


def test_hflip_moves_image_and_label_together():
    cfg = AugmentConfig(pipeline="hflip_only", prob=1.0)  # always flip
    rng = np.random.default_rng(6)
    imgs = rng.integers(0, 256, (3, 4, 6, 3), dtype=np.uint8)
    labels = rng.integers(0, 19, (3, 4, 6)).astype(np.int32)
    out, out_labels = augment_batch(
        jnp.array(imgs), jnp.array(labels), jax.random.PRNGKey(0), cfg
    )
    want_imgs = np.asarray(normalize_u8(jnp.array(imgs[:, :, ::-1]), cfg))
    np.testing.assert_allclose(np.asarray(out), want_imgs, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out_labels), labels[:, :, ::-1])


def test_full_pipeline_runs_under_jit_and_labels_unchanged():
    cfg = AugmentConfig(pipeline="all_four_combined")
    rng = np.random.default_rng(7)
    imgs = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    labels = rng.integers(0, 19, (2, 64, 64)).astype(np.int32)
    fn = jax.jit(lambda i, l, k: augment_batch(i, l, k, cfg))
    out, out_labels = fn(jnp.array(imgs), jnp.array(labels), jax.random.PRNGKey(9))
    assert np.isfinite(np.asarray(out)).all()
    # combined pipeline has no geometric ops -> labels untouched
    np.testing.assert_array_equal(np.asarray(out_labels), labels)
    # different key -> different augmentation
    out2, _ = fn(jnp.array(imgs), jnp.array(labels), jax.random.PRNGKey(10))
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_aug_dtype_bf16_tracks_f32_chain():
    """The default bf16 stochastic chain must match the f32 chain up to
    rounding: same keys -> same factors/masks/order on both paths, so the
    difference is pure arithmetic rounding (~2^-8 per op, plus rare hue
    sector flips at HSV boundaries)."""
    import dataclasses

    rng = np.random.default_rng(11)
    imgs = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    labels = rng.integers(0, 19, (2, 64, 64)).astype(np.int32)
    base = AugmentConfig(pipeline="all_four_combined", prob=1.0)
    outs = {}
    for dt in ("bfloat16", "float32"):
        cfg = dataclasses.replace(base, aug_dtype=dt)
        out, _ = augment_batch(
            jnp.array(imgs), jnp.array(labels), jax.random.PRNGKey(3), cfg
        )
        outs[dt] = np.asarray(out, np.float32)
    # normalized space: image-space diffs are amplified ~1/0.225 = 4.4x
    d = np.abs(outs["bfloat16"] - outs["float32"])
    assert np.mean(d) < 0.05, np.mean(d)
    assert np.quantile(d, 0.99) < 0.35, np.quantile(d, 0.99)


def test_coarse_dropout_clamps_oversized_holes():
    """Holes larger than the image are clamped (albumentations rejects
    them); origins stay non-negative so a hole can't blank everything."""
    import dataclasses

    from rtda_semanticsegmentation_tpu.config import AugmentConfig
    from rtda_semanticsegmentation_tpu.ops.augment import coarse_dropout

    cfg = dataclasses.replace(
        AugmentConfig(), cd_hole_size=(20, 60), cd_min_holes=1, cd_max_holes=1
    )
    img = jnp.ones((32, 32, 3), jnp.float32)
    # many keys: dropped area must never exceed the max hole area (32x32
    # clamped hole can cover at most the whole image only if hh=ww=32,
    # which requires the draw >= 32; area must be <= hh*ww always)
    for seed in range(8):
        out = coarse_dropout(img, jax.random.PRNGKey(seed), cfg)
        dropped = float((out[..., 0] == 0).sum())
        assert dropped <= 32 * 32
        assert jnp.isfinite(out).all()
