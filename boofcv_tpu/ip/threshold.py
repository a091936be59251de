"""Binarization / thresholding.

Reference analog: boofcv-ip alg/filter/binary/ThresholdImageOps.java,
GThresholdImageOps.java, ComputeOtsu.java, ThresholdSauvola.java,
ThresholdNick.java, ThresholdBlock*.java.  Output is a {0,1} image
(uint8), matching BoofCV's GrayU8 binary convention.
"""

from __future__ import annotations

import jax.numpy as jnp

from boofcv_tpu.ip import blur as _blur
from boofcv_tpu.ip import pixel_math as pm


def threshold(image: jnp.ndarray, value, down: bool = True) -> jnp.ndarray:
    """Global fixed threshold (ThresholdImageOps.threshold).

    down=True: 1 where I <= value; down=False: 1 where I > value.
    """
    if down:
        return (image <= value).astype(jnp.uint8)
    return (image > value).astype(jnp.uint8)


def compute_otsu(image: jnp.ndarray, min_value=0.0, max_value=255.0,
                 num_bins: int = 256):
    """Otsu's threshold from the histogram (ComputeOtsu.java).

    Returns the threshold in image units (maximizing between-class variance).
    """
    hist = pm.histogram(image, min_value, max_value, num_bins).astype(jnp.float64)
    total = jnp.sum(hist)
    bin_centers = jnp.arange(num_bins, dtype=jnp.float64)
    w0 = jnp.cumsum(hist)
    w1 = total - w0
    sum0 = jnp.cumsum(hist * bin_centers)
    sum_all = sum0[-1]
    m0 = sum0 / jnp.where(w0 == 0, 1.0, w0)
    m1 = (sum_all - sum0) / jnp.where(w1 == 0, 1.0, w1)
    between = w0 * w1 * (m0 - m1) ** 2
    idx = jnp.argmax(between)
    return min_value + (idx.astype(jnp.float64) + 0.5) * (max_value - min_value) / num_bins


def compute_entropy(image: jnp.ndarray, min_value=0.0, max_value=255.0,
                    num_bins: int = 256):
    """Maximum-entropy threshold (GThresholdImageOps.computeEntropy)."""
    hist = pm.histogram(image, min_value, max_value, num_bins).astype(jnp.float64)
    p = hist / jnp.sum(hist)
    eps = 1e-12
    c0 = jnp.cumsum(p)
    c1 = 1.0 - c0
    plogp = jnp.where(p > 0, p * jnp.log(p + eps), 0.0)
    h0 = jnp.cumsum(plogp)
    h_all = h0[-1]
    ent = (jnp.log(jnp.maximum(c0, eps)) - h0 / jnp.maximum(c0, eps)
           + jnp.log(jnp.maximum(c1, eps)) - (h_all - h0) / jnp.maximum(c1, eps))
    ent = jnp.where((c0 > 0) & (c1 > 0), ent, -jnp.inf)
    idx = jnp.argmax(ent)
    return min_value + (idx.astype(jnp.float64) + 0.5) * (max_value - min_value) / num_bins


def local_mean(image: jnp.ndarray, radius: int, scale: float = 0.95,
               down: bool = True) -> jnp.ndarray:
    """Adaptive threshold vs local mean (ThresholdImageOps.localMean)."""
    m = _blur.mean(image.astype(jnp.float32), radius)
    if down:
        return (image <= m * scale).astype(jnp.uint8)
    return (image > m * scale).astype(jnp.uint8)


def local_gaussian(image: jnp.ndarray, radius: int, scale: float = 0.95,
                   down: bool = True) -> jnp.ndarray:
    """Adaptive threshold vs local Gaussian-weighted mean."""
    m = _blur.gaussian(image.astype(jnp.float32), radius=radius)
    if down:
        return (image <= m * scale).astype(jnp.uint8)
    return (image > m * scale).astype(jnp.uint8)


def _local_mean_std(image: jnp.ndarray, radius: int):
    # one source of truth for the windowed mean/std math
    from boofcv_tpu.ip.stats import local_mean_std
    return local_mean_std(image, radius)


def sauvola(image: jnp.ndarray, radius: int, k: float = 0.3,
            down: bool = True) -> jnp.ndarray:
    """Sauvola adaptive threshold (ThresholdSauvola.java):
    T = m * (1 + k * (s / R - 1)), R = 128 for 8-bit input."""
    m, s = _local_mean_std(image, radius)
    t = m * (1.0 + k * (s / 128.0 - 1.0))
    if down:
        return (image <= t).astype(jnp.uint8)
    return (image > t).astype(jnp.uint8)


def nick(image: jnp.ndarray, radius: int, k: float = -0.2,
         down: bool = True) -> jnp.ndarray:
    """NICK threshold (ThresholdNick.java): T = m + k*sqrt((sum(I^2)-m^2)/N)."""
    m, s = _local_mean_std(image, radius)
    t = m + k * s
    if down:
        return (image <= t).astype(jnp.uint8)
    return (image > t).astype(jnp.uint8)


def block_min_max(image: jnp.ndarray, block_size: int, scale: float = 0.95,
                  down: bool = True, min_spread: float = 10.0) -> jnp.ndarray:
    """Block min/max threshold (ThresholdBlockMinMax.java).

    Partitions into blocks, thresholds at the midpoint of each block's
    local min/max (textureless blocks => background).
    """
    h, w = image.shape
    bh, bw = -(-h // block_size), -(-w // block_size)
    ph, pw = bh * block_size, bw * block_size
    padded = jnp.pad(image.astype(jnp.float32), ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = padded.reshape(bh, block_size, bw, block_size)
    bmin = blocks.min(axis=(1, 3))
    bmax = blocks.max(axis=(1, 3))
    t = (bmin + bmax) / 2.0 * scale
    textured = (bmax - bmin) >= min_spread
    t_img = jnp.repeat(jnp.repeat(t, block_size, 0), block_size, 1)[:h, :w]
    tex_img = jnp.repeat(jnp.repeat(textured, block_size, 0), block_size, 1)[:h, :w]
    if down:
        binary = image <= t_img
        return (binary & tex_img | ~tex_img).astype(jnp.uint8)
    binary = image > t_img
    return (binary & tex_img).astype(jnp.uint8)
