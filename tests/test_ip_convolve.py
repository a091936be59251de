"""Convolution vs naive numpy oracles — the reference's own test strategy
(each alg class tested against a brute-force implementation, SURVEY §4.1)."""

import numpy as np
import pytest

from boofcv_tpu.core.border import BorderType
from boofcv_tpu.core.kernel import gaussian_kernel, mean_kernel, gaussian_deriv_kernel
from boofcv_tpu.ip import convolve


def naive_horizontal(img, k, border="edge"):
    r = (len(k) - 1) // 2
    p = np.pad(img, ((0, 0), (r, r)), mode=border)
    out = np.zeros_like(img, dtype=np.float64)
    for i in range(len(k)):
        out += p[:, i:i + img.shape[1]] * k[i]
    return out


def naive_vertical(img, k, border="edge"):
    return naive_horizontal(img.T, k, border).T


def test_horizontal_extended(image_f32):
    k = np.asarray(gaussian_kernel(radius=2))
    got = np.asarray(convolve.horizontal(image_f32, k, BorderType.EXTENDED))
    want = naive_horizontal(image_f32, k)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_vertical_extended(image_f32):
    k = np.asarray(gaussian_deriv_kernel(radius=2))
    got = np.asarray(convolve.vertical(image_f32, k, BorderType.EXTENDED))
    want = naive_vertical(image_f32, k)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_skip_border_keeps_input(image_f32):
    k = np.asarray(mean_kernel(2))
    got = np.asarray(convolve.horizontal(image_f32, k, BorderType.SKIP))
    # border columns unchanged
    np.testing.assert_allclose(got[:, :2], image_f32[:, :2], rtol=1e-6)
    np.testing.assert_allclose(got[:, -2:], image_f32[:, -2:], rtol=1e-6)
    # interior matches
    want = naive_horizontal(image_f32, k)
    np.testing.assert_allclose(got[:, 2:-2], want[:, 2:-2], rtol=1e-4)


def test_normalized_border_renormalizes():
    img = np.ones((10, 12), dtype=np.float32) * 7.0
    k = np.asarray(gaussian_kernel(radius=3))
    got = np.asarray(convolve.horizontal(img, k, BorderType.NORMALIZED))
    # constant image must stay exactly constant under renormalized conv
    np.testing.assert_allclose(got, img, rtol=1e-5)


def test_convolve2d_matches_separable(image_f32):
    k = np.asarray(gaussian_kernel(radius=2))
    k2 = np.outer(k, k)
    a = np.asarray(convolve.convolve2d(image_f32, k2, BorderType.EXTENDED))
    b = np.asarray(convolve.separable(image_f32, k, k, BorderType.EXTENDED))
    # separable EXTENDED isn't identical at corners (pad-then-pad), interior must match
    np.testing.assert_allclose(a[2:-2, 2:-2], b[2:-2, 2:-2], rtol=1e-4)


def test_asymmetric_kernel_is_correlation(image_f32):
    """BoofCV scans the kernel left-to-right over the image (correlation)."""
    k = np.array([1.0, 0.0, 0.0], dtype=np.float32)  # picks pixel at x-1
    got = np.asarray(convolve.horizontal(image_f32, k, BorderType.EXTENDED))
    np.testing.assert_allclose(got[:, 1:], image_f32[:, :-1], rtol=1e-6)


def test_convolve_down():
    img = np.arange(64, dtype=np.float32).reshape(8, 8)
    k = np.array([1.0], dtype=np.float32)
    out = np.asarray(convolve.convolve_down(img, k, skip=2, axis=1))
    np.testing.assert_allclose(out, img[:, ::2])


def test_sparse_sample(image_f32):
    k2 = np.asarray(gaussian_kernel(radius=1))
    k2 = np.outer(k2, k2)
    ys = np.array([5, 10, 20])
    xs = np.array([7, 3, 30])
    got = np.asarray(convolve.sparse_sample(image_f32, k2, ys, xs))
    full = np.asarray(convolve.convolve2d(image_f32, k2, BorderType.EXTENDED))
    np.testing.assert_allclose(got, full[ys, xs], rtol=1e-4)
