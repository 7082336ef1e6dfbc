"""Distributional oracles for the on-device augmentations (VERDICT r1 #5).

The mechanics tests (test_augment.py) check parameter ranges and geometry;
these compare the *distributions* our jax reimplementations produce against
independent numpy implementations of the albumentations / torchvision math
(reference ``config.py:122-241``) — moments and KS statistics over many
keys, including the small-lambda ISONoise regime where a plain Gaussian
approximation of the Poisson is visibly wrong (skew 1/sqrt(lam),
discreteness). Exact RNG parity is impossible by construction; agreement of
the laws is the contract.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rtda_semanticsegmentation_tpu.config import AugmentConfig
from rtda_semanticsegmentation_tpu.ops.augment import (
    _poisson_approx,
    coarse_dropout,
    color_jitter,
    iso_noise,
)
from rtda_semanticsegmentation_tpu.ops.colorspace import rgb_to_hls


def _skew(x):
    x = np.asarray(x, np.float64)
    return float(((x - x.mean()) ** 3).mean() / x.std() ** 3)


def _ks_discrete(a, b):
    """KS distance between two integer-valued samples."""
    hi = int(max(a.max(), b.max())) + 1
    ca = np.bincount(a.astype(int), minlength=hi).cumsum() / len(a)
    cb = np.bincount(b.astype(int), minlength=hi).cumsum() / len(b)
    return float(np.abs(ca - cb).max())


@pytest.mark.parametrize("lam", [1.5, 3.0, 7.7, 20.0])
def test_poisson_approx_matches_true_poisson(lam):
    """The skew-corrected rounded Gaussian vs numpy's true Poisson: matching
    mean/variance/skewness and KS < 0.015 down to lam=1.5 — the
    low-intensity ISONoise regime (stddev ~ 0.1, intensity 0.1 ->
    lam ~ 2.5) where a plain Gaussian is measurably wrong."""
    n = 400_000
    ours = np.asarray(_poisson_approx(jax.random.PRNGKey(1), lam, (n,)))
    ref = np.random.RandomState(0).poisson(lam, n).astype(np.float64)
    assert (ours >= 0).all() and np.allclose(ours, np.round(ours))
    assert ours.mean() == pytest.approx(ref.mean(), rel=0.02)
    assert ours.var() == pytest.approx(ref.var(), rel=0.06)
    assert _skew(ours) == pytest.approx(1.0 / np.sqrt(lam), rel=0.15)
    assert _ks_discrete(ours, ref) < 0.015
    # and the UNcorrected plain Gaussian demonstrably fails the same gate
    # at small lam (this is what the correction buys):
    if lam <= 3.0:
        z = np.random.RandomState(1).normal(size=n)
        plain = np.maximum(np.round(lam + np.sqrt(lam) * z), 0.0)
        assert abs(_skew(plain)) < 0.5 * (1.0 / np.sqrt(lam))
        assert _ks_discrete(plain, ref) > 0.015


# ---------------------------------------------------------------------------
# numpy oracle of albumentations' ISONoise (reference config.py:210 pipeline;
# albumentations.transforms.ISONoise.apply semantics)
# ---------------------------------------------------------------------------


def _np_rgb_to_hls(img):
    maxc = img.max(-1)
    minc = img.min(-1)
    l = (maxc + minc) / 2.0
    delta = maxc - minc
    s = np.where(
        delta == 0,
        0.0,
        np.where(l < 0.5, delta / (maxc + minc + 1e-12),
                 delta / (2.0 - maxc - minc + 1e-12)),
    )
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    h = np.where(
        delta == 0, 0.0,
        np.where(maxc == r, ((g - b) / (delta + 1e-12)) % 6.0,
                 np.where(maxc == g, (b - r) / (delta + 1e-12) + 2.0,
                          (r - g) / (delta + 1e-12) + 4.0)),
    ) * 60.0
    return h, l, s


def _np_iso_noise_l_samples(img, intensity, rng, k):
    """k draws of the albumentations luminance update on one image; returns
    the flattened L-channel *after* noise (the part our Gaussian
    approximates)."""
    _, l, _ = _np_rgb_to_hls(img)
    stddev = l.std()
    out = []
    for _ in range(k):
        noise = rng.poisson(stddev * intensity * 255.0, size=l.shape)
        out.append(np.clip(l + (noise / 255.0) * (1.0 - l), 0.0, 1.0))
    return np.concatenate([o.ravel() for o in out])


def test_iso_noise_luminance_distribution_matches_albumentations():
    """Fixed image + fixed intensity: the L-channel law after our iso_noise
    matches the numpy/albumentations oracle (true Poisson) in mean/std/skew."""
    rng = np.random.RandomState(3)
    img = (rng.rand(24, 24, 3) * 0.3 + 0.2).astype(np.float32)  # L std ~ 0.08
    intensity = 0.15  # small-lambda regime
    cfg = AugmentConfig()
    cfg = dataclasses.replace(
        cfg,
        iso_intensity=(intensity, intensity),
        iso_color_shift=(0.0, 1e-9),  # isolate the luminance path
    )
    k = 64
    keys = jax.random.split(jax.random.PRNGKey(5), k)
    outs = jax.vmap(lambda key: iso_noise(jnp.asarray(img), key, cfg))(keys)
    l_ours = np.asarray(
        jax.vmap(rgb_to_hls)(outs)[..., 1]
    ).ravel()
    l_ref = _np_iso_noise_l_samples(img, intensity, np.random.RandomState(7), k)
    assert l_ours.mean() == pytest.approx(l_ref.mean(), abs=3e-3)
    assert l_ours.std() == pytest.approx(l_ref.std(), rel=0.05)
    assert _skew(l_ours) == pytest.approx(_skew(l_ref), abs=0.25)


def test_iso_noise_hue_shift_distribution():
    """Hue noise: Normal(0, color_shift*360*intensity) degrees, circular."""
    rng = np.random.RandomState(4)
    img = (rng.rand(24, 24, 3) * 0.5 + 0.25).astype(np.float32)
    cfg = dataclasses.replace(
        AugmentConfig(),
        iso_intensity=(0.2, 0.2),
        iso_color_shift=(0.04, 0.04),
    )
    h0 = np.asarray(rgb_to_hls(jnp.asarray(img)))[..., 0]
    k = 48
    keys = jax.random.split(jax.random.PRNGKey(9), k)
    outs = jax.vmap(lambda key: iso_noise(jnp.asarray(img), key, cfg))(keys)
    h1 = np.asarray(jax.vmap(rgb_to_hls)(outs)[..., 0])
    # circular difference, degrees
    d = (h1 - h0[None]) % 360.0
    d = np.where(d > 180.0, d - 360.0, d)
    want_std = 0.04 * 360.0 * 0.2  # 2.88 degrees
    # luminance noise also perturbs hue slightly through clipping; allow 15%
    assert abs(float(np.mean(d))) < 0.5
    assert float(np.std(d)) == pytest.approx(want_std, rel=0.15)


# ---------------------------------------------------------------------------
# torchvision/albumentations ColorJitter oracle
# ---------------------------------------------------------------------------

_W = np.array([0.299, 0.587, 0.114])


def _np_color_jitter(img, rng, cfg):
    """numpy oracle of torchvision ColorJitter math: uniform factors,
    uniformly random op order, torchvision blend formulas (hue op omitted —
    isolated below via cj_hue=0)."""

    def brightness(x, f):
        return np.clip(x * f, 0, 1)

    def contrast(x, f):
        mean = (x @ _W).mean()
        return np.clip(f * x + (1 - f) * mean, 0, 1)

    def saturation(x, f):
        gray = (x @ _W)[..., None]
        return np.clip(f * x + (1 - f) * gray, 0, 1)

    fb = rng.uniform(1 - cfg.cj_brightness, 1 + cfg.cj_brightness)
    fc = rng.uniform(1 - cfg.cj_contrast, 1 + cfg.cj_contrast)
    fs = rng.uniform(1 - cfg.cj_saturation, 1 + cfg.cj_saturation)
    rng.uniform(-cfg.cj_hue, cfg.cj_hue)  # hue factor drawn but inert at 0
    ops = [lambda x: brightness(x, fb), lambda x: contrast(x, fc),
           lambda x: saturation(x, fs), lambda x: x]
    for i in rng.permutation(4):
        img = ops[i](img)
    return img


def test_color_jitter_distribution_matches_torchvision_math():
    rng = np.random.RandomState(11)
    img = rng.rand(16, 16, 3).astype(np.float32)
    cfg = dataclasses.replace(AugmentConfig(), cj_hue=0.0)  # isolate B/C/S
    k = 400
    keys = jax.random.split(jax.random.PRNGKey(13), k)
    ours = np.asarray(
        jax.vmap(lambda key: color_jitter(jnp.asarray(img), key, cfg))(keys)
    )
    oracle_rng = np.random.RandomState(17)
    ref = np.stack([_np_color_jitter(img, oracle_rng, cfg) for _ in range(k)])
    # per-channel first/second moments of the output law
    np.testing.assert_allclose(
        ours.mean((0, 1, 2)), ref.mean((0, 1, 2)), atol=0.01
    )
    np.testing.assert_allclose(
        ours.std((0, 1, 2)), ref.std((0, 1, 2)), rtol=0.08
    )
    # per-image means spread (captures the factor ranges + op-order mix)
    assert ours.mean((1, 2, 3)).std() == pytest.approx(
        ref.mean((1, 2, 3)).std(), rel=0.15
    )


def test_coarse_dropout_zero_rate_matches_oracle():
    """P(pixel zeroed) under our static-shape CoarseDropout == a numpy
    oracle of albumentations' box sampling (1..8 holes, 20-60 px)."""
    cfg = AugmentConfig()
    H = W = 96
    img = np.full((H, W, 3), 0.5, np.float32)
    k = 300
    keys = jax.random.split(jax.random.PRNGKey(19), k)
    ours = np.asarray(
        jax.vmap(lambda key: coarse_dropout(jnp.asarray(img), key, cfg))(keys)
    )
    ours_rate = float((ours[..., 0] == cfg.cd_fill).mean())

    rng = np.random.RandomState(23)
    lo, hi = cfg.cd_hole_size
    zero = 0
    for _ in range(k):
        mask = np.zeros((H, W), bool)
        n = rng.randint(cfg.cd_min_holes, cfg.cd_max_holes + 1)
        for _ in range(n):
            hh = min(rng.randint(lo, hi + 1), H)
            ww = min(rng.randint(lo, hi + 1), W)
            y = int(rng.uniform() * max(H - hh, 0))
            x = int(rng.uniform() * max(W - ww, 0))
            mask[y:y + hh, x:x + ww] = True
        zero += mask.mean()
    ref_rate = zero / k
    assert ours_rate == pytest.approx(ref_rate, rel=0.12)
