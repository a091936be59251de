"""Keypoint orientation estimators.

Reference analog: boofcv-feature alg/feature/orientation/ —
OrientationAverage (weighted mean gradient), OrientationHistogram,
OrientationSlidingWindow, and the integral-image Haar variants used by
SURF (already in feature/describe.orientation_average_haar).

All estimators are batched over N keypoints: one gather of the gradient
patches, then reductions.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from boofcv_tpu.ip.interpolate import sample_rect_bilinear


def _grad_patches(image, ys, xs, radius, scale=None):
    img = jnp.asarray(image, jnp.float32)
    gx_img = jnp.roll(img, -1, 1) - jnp.roll(img, 1, 1)
    gy_img = jnp.roll(img, -1, 0) - jnp.roll(img, 1, 0)
    gx = sample_rect_bilinear(gx_img, ys, xs, radius)
    gy = sample_rect_bilinear(gy_img, ys, xs, radius)
    return gx, gy


def average(image, ys, xs, radius: int = 6, weighted: bool = True):
    """Weighted average-gradient angle (OrientationAverage)."""
    gx, gy = _grad_patches(image, ys, xs, radius)
    if weighted:
        d = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
        w = jnp.exp(-0.5 * (d[:, None] ** 2 + d[None, :] ** 2)
                    / (radius / 2.0) ** 2)
        gx = gx * w
        gy = gy * w
    return jnp.arctan2(jnp.sum(gy, axis=(1, 2)), jnp.sum(gx, axis=(1, 2)))


def histogram(image, ys, xs, radius: int = 6, num_bins: int = 36):
    """Dominant histogram-bin angle (OrientationHistogram)."""
    gx, gy = _grad_patches(image, ys, xs, radius)
    mag = jnp.hypot(gx, gy)
    ang = jnp.arctan2(gy, gx) % (2 * np.pi)
    bins = jnp.clip((ang / (2 * np.pi) * num_bins).astype(jnp.int32),
                    0, num_bins - 1)
    n = ys.shape[0]
    flat_b = bins.reshape(n, -1)
    flat_m = mag.reshape(n, -1)
    hist = jax.vmap(lambda b, m: jnp.zeros((num_bins,)).at[b].add(m))(
        flat_b, flat_m)
    best = jnp.argmax(hist, axis=1)
    return (best.astype(jnp.float32) + 0.5) * (2 * np.pi / num_bins)


def sliding_window(image, ys, xs, radius: int = 6,
                   window: float = np.pi / 3, num_steps: int = 32):
    """Angle of the window maximizing summed gradient magnitude
    (OrientationSlidingWindow)."""
    gx, gy = _grad_patches(image, ys, xs, radius)
    mag = jnp.hypot(gx, gy).reshape(ys.shape[0], -1)
    ang = jnp.arctan2(gy, gx).reshape(ys.shape[0], -1)
    centers = jnp.linspace(-np.pi, np.pi, num_steps, endpoint=False)
    diff = jnp.abs(((ang[:, None, :] - centers[None, :, None])
                    + np.pi) % (2 * np.pi) - np.pi)
    inside = diff <= window / 2
    sx = jnp.sum(jnp.where(inside, (mag * jnp.cos(ang))[:, None, :], 0.0), -1)
    sy = jnp.sum(jnp.where(inside, (mag * jnp.sin(ang))[:, None, :], 0.0), -1)
    score = sx * sx + sy * sy
    best = jnp.argmax(score, axis=1)
    n = ys.shape[0]
    return jnp.arctan2(sy[jnp.arange(n), best], sx[jnp.arange(n), best])
