"""Elementwise pixel math + statistics.

Reference analog: boofcv-ip alg/misc/PixelMath.java (7.2k LoC),
ImageMiscOps.java, ImageStatistics.java, ImageNormalization.java — all
generated per-dtype loops.  Here each is a one-line jnp expression; kept as
named functions so the capability surface is explicit and greppable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# ---- PixelMath ----------------------------------------------------------

def abs(image):  # noqa: A001 - mirrors PixelMath.abs
    return jnp.abs(image)

def negative(image):
    return -image

def invert(image, max_value=255.0):
    """invert intensity: max - I (GrayImageOps.invert)."""
    return max_value - image

def divide(image, denominator):
    return image / denominator

def multiply(image, scale):
    return image * scale

def plus(image, value):
    return image + value

def minus(image, value, reverse=False):
    return value - image if reverse else image - value

def log(image, val=1.0):
    """log(val + I) (PixelMath.log)."""
    return jnp.log(val + image)

def log_sign(image, val=1.0):
    """sgn(I) * log(val + |I|) (PixelMath.logSign)."""
    return jnp.sign(image) * jnp.log(val + jnp.abs(image))

def pow2(image):
    return image * image

def sqrt(image):
    return jnp.sqrt(image)

def add(a, b):
    return a + b

def subtract(a, b):
    return a - b

def multiply_images(a, b):
    return a * b

def divide_images(a, b):
    return a / b

def bound_image(image, lo, hi):
    return jnp.clip(image, lo, hi)

def diff_abs(a, b):
    return jnp.abs(a - b)

def average_band(image_hwc):
    """Mean across bands (PixelMath.averageBand on Planar)."""
    return jnp.mean(image_hwc, axis=-1)

def stdev_band(image_hwc):
    return jnp.std(image_hwc, axis=-1)

def minimum_band(image_hwc):
    return jnp.min(image_hwc, axis=-1)

def maximum_band(image_hwc):
    return jnp.max(image_hwc, axis=-1)


# ---- ImageStatistics ----------------------------------------------------

def min(image):  # noqa: A001
    return jnp.min(image)

def max(image):  # noqa: A001
    return jnp.max(image)

def max_abs(image):
    return jnp.max(jnp.abs(image))

def sum(image):  # noqa: A001
    return jnp.sum(image)

def mean(image):
    return jnp.mean(image)

def variance(image, mean_value=None):
    if mean_value is None:
        return jnp.var(image)
    return jnp.mean((image - mean_value) ** 2)

def mean_diff_sq(a, b):
    return jnp.mean((a - b) ** 2)

def mean_diff_abs(a, b):
    return jnp.mean(jnp.abs(a - b))

def histogram(image, min_value, max_value, num_bins):
    """ImageStatistics.histogram — counts per equal-width bin."""
    scaled = (image - min_value) * (num_bins / (max_value - min_value))
    idx = jnp.clip(scaled.astype(jnp.int32), 0, num_bins - 1)
    return jnp.bincount(idx.ravel(), length=num_bins)


# ---- ImageMiscOps -------------------------------------------------------

def fill(image, value):
    return jnp.full_like(image, value)

def fill_uniform(key, shape, lo, hi, dtype=jnp.float32):
    if jnp.issubdtype(dtype, jnp.integer):
        return jax.random.randint(key, shape, int(lo), int(hi), dtype=dtype)
    return jax.random.uniform(key, shape, minval=lo, maxval=hi, dtype=dtype)

def fill_gaussian(key, shape, mean_v, sigma, lo, hi, dtype=jnp.float32):
    vals = mean_v + sigma * jax.random.normal(key, shape)
    return jnp.clip(vals, lo, hi).astype(dtype)

def add_gaussian_noise(key, image, sigma, lo, hi):
    noisy = image + sigma * jax.random.normal(key, image.shape, dtype=image.dtype)
    return jnp.clip(noisy, lo, hi)

def flip_vertical(image):
    return image[::-1]

def flip_horizontal(image):
    return image[:, ::-1]

def rotate_cw(image):
    return jnp.rot90(image, k=-1)

def rotate_ccw(image):
    return jnp.rot90(image, k=1)

def transpose(image):
    return jnp.swapaxes(image, 0, 1)

def insert_band(image_hwc, band, values):
    return image_hwc.at[..., band].set(values)

def extract_band(image_hwc, band):
    return image_hwc[..., band]


# ---- ImageNormalization -------------------------------------------------

def normalize_max_abs(image, target=1.0):
    """Scale so max |value| = target (ImageNormalization.maxAbsOfOne)."""
    m = jnp.max(jnp.abs(image))
    return image * (target / jnp.where(m == 0, 1.0, m))

def normalize_zero_mean_unit_var(image):
    mu = jnp.mean(image)
    sd = jnp.std(image)
    return (image - mu) / jnp.where(sd == 0, 1.0, sd)

def normalize_zero_mean_max_one(image):
    mu = jnp.mean(image)
    shifted = image - mu
    m = jnp.max(jnp.abs(shifted))
    return shifted / jnp.where(m == 0, 1.0, m)
