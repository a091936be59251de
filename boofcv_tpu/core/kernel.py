"""Convolution-kernel construction.

Reference analog: boofcv-ip factory/filter/kernel/FactoryKernelGaussian.java
and struct/convolve/Kernel1D_*.java.  Kernels here are plain jnp vectors /
matrices (odd length, centered); the offset/odd-even machinery of the
reference collapses because everything is float.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp


def gaussian_sigma_for_radius(radius: int, order: int = 0) -> float:
    """Default sigma for a given radius.

    Matches FactoryKernelGaussian.sigmaForRadius (boofcv-ip
    factory/filter/kernel/FactoryKernelGaussian.java): sigma = (r*2+1)/6
    widened for derivative order.
    """
    return (radius * 2 + 1) / 6.0 * (1.0 + order * 0.15)


def gaussian_radius_for_sigma(sigma: float, order: int = 0) -> int:
    """Inverse of :func:`gaussian_sigma_for_radius` (ceil): the forward
    map is sigma = (2r+1)/6 * (1 + 0.15*order), so the order factor
    DIVIDES here (multiplying made every gaussian_deriv_kernel(sigma=..)
    resolve a radius ~32% wider than the radius-specified equivalent)."""
    return int(math.ceil((6.0 * sigma / (1.0 + order * 0.15) - 1.0) / 2.0))


def gaussian_kernel(sigma: float = -1.0, radius: int = -1,
                    dtype=jnp.float32) -> jnp.ndarray:
    """1D normalized Gaussian kernel of length 2*radius+1.

    Either sigma or radius may be unspecified (<=0) and is derived from the
    other, as in FactoryKernelGaussian.gaussian1D.
    """
    sigma, radius = _resolve(sigma, radius, order=0)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k /= k.sum()
    return jnp.asarray(k, dtype=dtype)


def gaussian_deriv_kernel(sigma: float = -1.0, radius: int = -1,
                          dtype=jnp.float32) -> jnp.ndarray:
    """1D derivative-of-Gaussian kernel (FactoryKernelGaussian.derivativeI).

    Normalized so that convolution with a unit ramp returns 1.
    """
    sigma, radius = _resolve(sigma, radius, order=1)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    g = np.exp(-0.5 * (x / sigma) ** 2)
    k = -x / (sigma ** 2) * g
    # normalize response on ramp f(x)=x: sum(k * x) should be 1
    resp = float(np.sum(k * x))
    if resp != 0:
        k /= resp
    return jnp.asarray(k, dtype=dtype)


def gaussian_kernel_2d(sigma: float = -1.0, radius: int = -1,
                       dtype=jnp.float32) -> jnp.ndarray:
    k = gaussian_kernel(sigma, radius, dtype=jnp.float64)
    k2 = jnp.outer(k, k)
    return (k2 / jnp.sum(k2)).astype(dtype)


def mean_kernel(radius: int, dtype=jnp.float32) -> jnp.ndarray:
    n = 2 * radius + 1
    return jnp.full((n,), 1.0 / n, dtype=dtype)


def normalize_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    s = jnp.sum(kernel)
    return jnp.where(s != 0, kernel / s, kernel)


def _resolve(sigma: float, radius: int, order: int) -> tuple[float, int]:
    if sigma <= 0 and radius <= 0:
        raise ValueError("either sigma or radius must be specified")
    if sigma <= 0:
        sigma = gaussian_sigma_for_radius(radius, order)
    elif radius <= 0:
        radius = gaussian_radius_for_sigma(sigma, order)
    return float(sigma), int(radius)
