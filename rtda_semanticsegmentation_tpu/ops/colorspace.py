"""Vectorized RGB <-> HSV/HLS colorspace conversions in jnp.

Needed by the device-side ColorJitter (hue shift, HSV) and ISONoise (HLS)
augmentations. Conventions follow OpenCV float-image behavior, which is what
albumentations uses on the reference's CPU pipeline: H in degrees [0, 360),
S/L/V in [0, 1].
"""

from __future__ import annotations

import jax.numpy as jnp


def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) RGB in [0,1] -> (..., 3) HSV with H in degrees."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    delta = maxc - minc
    safe = jnp.where(delta > 0, delta, 1.0)
    h = jnp.where(
        delta == 0,
        0.0,
        jnp.where(
            maxc == r,
            (g - b) / safe % 6.0,
            jnp.where(maxc == g, (b - r) / safe + 2.0, (r - g) / safe + 4.0),
        ),
    )
    h = h * 60.0
    s = jnp.where(maxc > 0, delta / jnp.where(maxc > 0, maxc, 1.0), 0.0)
    return jnp.stack([h, s, maxc], axis=-1)


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    h, s, v = hsv[..., 0] % 360.0, hsv[..., 1], hsv[..., 2]
    c = v * s
    hp = h / 60.0
    x = c * (1.0 - jnp.abs(hp % 2.0 - 1.0))
    m = v - c
    z = jnp.zeros_like(c)
    sector = jnp.floor(hp).astype(jnp.int32) % 6
    r = jnp.select(
        [sector == 0, sector == 1, sector == 2, sector == 3, sector == 4],
        [c, x, z, z, x], default=c,
    )
    g = jnp.select(
        [sector == 0, sector == 1, sector == 2, sector == 3, sector == 4],
        [x, c, c, x, z], default=z,
    )
    b = jnp.select(
        [sector == 0, sector == 1, sector == 2, sector == 3, sector == 4],
        [z, z, x, c, c], default=x,
    )
    return jnp.stack([r + m, g + m, b + m], axis=-1)


def rgb_to_hls(rgb: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) RGB in [0,1] -> (..., 3) HLS (OpenCV channel order H, L, S)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    delta = maxc - minc
    l = (maxc + minc) / 2.0
    denom = jnp.where(l < 0.5, maxc + minc, 2.0 - maxc - minc)
    s = jnp.where(delta == 0, 0.0, delta / jnp.where(denom > 0, denom, 1.0))
    safe = jnp.where(delta > 0, delta, 1.0)
    h = jnp.where(
        delta == 0,
        0.0,
        jnp.where(
            maxc == r,
            (g - b) / safe % 6.0,
            jnp.where(maxc == g, (b - r) / safe + 2.0, (r - g) / safe + 4.0),
        ),
    )
    return jnp.stack([h * 60.0, l, s], axis=-1)


def hls_to_rgb(hls: jnp.ndarray) -> jnp.ndarray:
    h, l, s = hls[..., 0] % 360.0, hls[..., 1], hls[..., 2]
    c = (1.0 - jnp.abs(2.0 * l - 1.0)) * s
    hp = h / 60.0
    x = c * (1.0 - jnp.abs(hp % 2.0 - 1.0))
    m = l - c / 2.0
    z = jnp.zeros_like(c)
    sector = jnp.floor(hp).astype(jnp.int32) % 6
    r = jnp.select(
        [sector == 0, sector == 1, sector == 2, sector == 3, sector == 4],
        [c, x, z, z, x], default=c,
    )
    g = jnp.select(
        [sector == 0, sector == 1, sector == 2, sector == 3, sector == 4],
        [x, c, c, x, z], default=z,
    )
    b = jnp.select(
        [sector == 0, sector == 1, sector == 2, sector == 3, sector == 4],
        [z, z, x, c, c], default=x,
    )
    return jnp.stack([r + m, g + m, b + m], axis=-1)
