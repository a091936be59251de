"""Discrete Fourier transform ops.

Reference analog: boofcv-ip alg/transform/fft/ (GeneralPurposeFFT_F32_*,
DiscreteFourierTransformOps.java).  The reference ports GSL radix code;
here the XLA FFT primitive does the work and this module provides the
same utility surface: forward/inverse, magnitude/phase, shifts, and
frequency-domain filtering.
"""

from __future__ import annotations

import jax.numpy as jnp


def forward(image):
    """2D FFT of a real image -> complex spectrum."""
    return jnp.fft.fft2(jnp.asarray(image, jnp.float32))


def inverse(spectrum):
    """Inverse 2D FFT -> real image."""
    return jnp.real(jnp.fft.ifft2(spectrum))


def magnitude(spectrum):
    return jnp.abs(spectrum)


def phase(spectrum):
    return jnp.angle(spectrum)


def shift(spectrum):
    """Center the zero frequency (DiscreteFourierTransformOps.shift)."""
    return jnp.fft.fftshift(spectrum)


def unshift(spectrum):
    return jnp.fft.ifftshift(spectrum)


def multiply_spectra(a, b):
    """Elementwise complex product (frequency-domain convolution)."""
    return a * b


def filter_frequency(image, transfer):
    """Apply a frequency-domain transfer function (same shape, real or
    complex, zero-frequency at corner) and return the real image."""
    return inverse(forward(image) * transfer)


def gaussian_lowpass_transfer(height: int, width: int, sigma_frac: float):
    """Gaussian low-pass transfer function; sigma as a fraction of the
    Nyquist frequency."""
    fy = jnp.fft.fftfreq(height)
    fx = jnp.fft.fftfreq(width)
    d2 = fy[:, None] ** 2 + fx[None, :] ** 2
    s = sigma_frac * 0.5
    return jnp.exp(-0.5 * d2 / (s * s))
