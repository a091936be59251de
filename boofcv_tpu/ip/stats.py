"""Local image statistics & normalization.

Reference analog: boofcv-ip alg/filter/stat/ImageLocalNormalization.java
(zero-mean/unit-variance windows) and alg/misc/ImageNormalization.java.
"""

from __future__ import annotations

import jax.numpy as jnp

from boofcv_tpu.core.border import BorderType
from boofcv_tpu.core.kernel import gaussian_kernel, mean_kernel
from boofcv_tpu.ip import convolve


def local_mean_std(image, radius: int, gaussian: bool = False):
    """Windowed mean and stdev per pixel."""
    img = jnp.asarray(image, jnp.float32)
    k = (gaussian_kernel(radius=radius) if gaussian
         else mean_kernel(radius))
    mean = convolve.separable(img, k, k, BorderType.NORMALIZED)
    mean2 = convolve.separable(img * img, k, k, BorderType.NORMALIZED)
    var = jnp.maximum(mean2 - mean * mean, 0.0)
    return mean, jnp.sqrt(var)


def local_normalize(image, radius: int, delta: float = 1e-4,
                    gaussian: bool = True):
    """Zero-mean unit-variance local normalization
    (ImageLocalNormalization.zeroMeanStdOne)."""
    mean, std = local_mean_std(image, radius, gaussian)
    return (jnp.asarray(image, jnp.float32) - mean) / (std + delta)


def normalize_minmax(image, out_min: float = 0.0, out_max: float = 1.0):
    """Global min-max rescale (ImageNormalization)."""
    img = jnp.asarray(image, jnp.float32)
    lo = jnp.min(img)
    hi = jnp.max(img)
    scale = (out_max - out_min) / jnp.maximum(hi - lo, 1e-12)
    return (img - lo) * scale + out_min


def normalize_zero_mean_unit_var(image):
    img = jnp.asarray(image, jnp.float32)
    m = jnp.mean(img)
    s = jnp.std(img)
    return (img - m) / jnp.maximum(s, 1e-12)
