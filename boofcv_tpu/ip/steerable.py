"""Steerable Gaussian-derivative kernels + kernel math.

Reference analog: boofcv-ip alg/filter/kernel/SteerableKernel.java,
FactorySteerable, KernelMath.java — synthesize an oriented derivative
kernel as a weighted sum of basis kernels.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from boofcv_tpu.core.kernel import gaussian_kernel, gaussian_deriv_kernel


def gaussian_basis_2d(order_x: int, order_y: int, sigma: float,
                      radius: int) -> jnp.ndarray:
    """Separable Gaussian-derivative kernel G_{xy} of given orders."""
    kx = (gaussian_deriv_kernel(sigma, radius, dtype=jnp.float64)
          if order_x == 1 else gaussian_kernel(sigma, radius, dtype=jnp.float64))
    ky = (gaussian_deriv_kernel(sigma, radius, dtype=jnp.float64)
          if order_y == 1 else gaussian_kernel(sigma, radius, dtype=jnp.float64))
    if order_x == 2:
        kx = _second_deriv(sigma, radius)
    if order_y == 2:
        ky = _second_deriv(sigma, radius)
    return jnp.outer(ky, kx).astype(jnp.float32)


def _second_deriv(sigma, radius):
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    g = np.exp(-0.5 * (x / sigma) ** 2)
    k = (x * x / sigma ** 4 - 1.0 / sigma ** 2) * g
    k -= k.mean()
    return jnp.asarray(k)


def steer_first_derivative(angle: float, sigma: float, radius: int):
    """G1 at an angle: cos(a) Gx + sin(a) Gy (SteerableKernel first order)."""
    gx = gaussian_basis_2d(1, 0, sigma, radius)
    gy = gaussian_basis_2d(0, 1, sigma, radius)
    return math.cos(angle) * gx + math.sin(angle) * gy


def steer_second_derivative(angle: float, sigma: float, radius: int):
    """G2 at an angle: cos^2 Gxx + 2 cos sin Gxy + sin^2 Gyy."""
    gxx = gaussian_basis_2d(2, 0, sigma, radius)
    gyy = gaussian_basis_2d(0, 2, sigma, radius)
    gxy = gaussian_basis_2d(1, 1, sigma, radius)
    c, s = math.cos(angle), math.sin(angle)
    return c * c * gxx + 2 * c * s * gxy + s * s * gyy


# ------------------------- kernel math (KernelMath) -----------------------

def transpose(kernel2d):
    return jnp.swapaxes(jnp.asarray(kernel2d), -1, -2)


def convolve_kernels_1d(a, b):
    """1D kernel composition (KernelMath.convolve1D)."""
    return jnp.convolve(jnp.asarray(a), jnp.asarray(b), mode="full")


def convolve_kernel_2d_from_1d(kx, ky):
    return jnp.outer(jnp.asarray(ky), jnp.asarray(kx))


def normalize_sum_to_one(kernel):
    k = jnp.asarray(kernel)
    s = jnp.sum(k)
    return jnp.where(s != 0, k / s, k)
