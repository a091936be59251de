"""Blur, derivative, integral, threshold, binary, census, interpolate,
distort, enhance, color — oracle tests (SURVEY §4 strategy)."""

import numpy as np
import jax.numpy as jnp
import pytest

from boofcv_tpu.core.border import BorderType
from boofcv_tpu.ip import (binary, blur, census, color, derivative, distort,
                           enhance, integral, interpolate, pixel_math as pm,
                           threshold)


# ---------------- blur ----------------

def test_median_blur(image_f32):
    got = np.asarray(blur.median(image_f32, 1))
    import scipy.ndimage  # not available? fallback manual
    h, w = image_f32.shape
    p = np.pad(image_f32, 1, mode="edge")
    want = np.zeros_like(image_f32)
    for y in range(h):
        for x in range(w):
            want[y, x] = np.median(p[y:y + 3, x:x + 3])
    np.testing.assert_allclose(got, want)


def test_mean_blur_constant():
    img = np.full((16, 16), 3.5, np.float32)
    out = np.asarray(blur.mean(img, 3))
    np.testing.assert_allclose(out, img, rtol=1e-5)


def test_gaussian_blur_preserves_mean(image_f32):
    out = np.asarray(blur.gaussian(image_f32, sigma=2.0))
    assert abs(out.mean() - image_f32.mean()) < 1.0


# ---------------- derivatives ----------------

def test_sobel_on_ramp():
    img = np.tile(np.arange(32, dtype=np.float32), (16, 1)) * 2.0
    dx, dy = derivative.sobel(img)
    # Sobel [-1,0,1]x[1,2,1] on ramp slope 2 -> response 2*2*(1+2+1)=16
    np.testing.assert_allclose(np.asarray(dx)[2:-2, 2:-2], 16.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dy)[2:-2, 2:-2], 0.0, atol=1e-4)


def test_three_gradient_on_ramp():
    img = np.tile(np.arange(32, dtype=np.float32), (16, 1))
    dx, dy = derivative.three(img)
    np.testing.assert_allclose(np.asarray(dx)[1:-1, 1:-1], 1.0, rtol=1e-6)


def test_laplacian_of_constant_zero():
    img = np.full((8, 8), 9.0, np.float32)
    out = np.asarray(derivative.laplacian(img))
    np.testing.assert_allclose(out, 0.0, atol=1e-5)


# ---------------- integral ----------------

def test_integral_transform(image_f32):
    ii = np.asarray(integral.transform(image_f32))
    want = image_f32.astype(np.float64).cumsum(0).cumsum(1)
    np.testing.assert_allclose(ii, want, rtol=1e-4)


def test_integral_block_sum(image_f32):
    ii = integral.transform(image_f32)
    got = float(integral.block_sum(ii, 3, 2, 10, 9))
    want = image_f32[2:10, 3:11].sum()
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_integral_block_sum_at_origin(image_f32):
    ii = integral.transform(image_f32)
    got = float(integral.block_sum(ii, 0, 0, 4, 4))
    np.testing.assert_allclose(got, image_f32[:5, :5].sum(), rtol=1e-4)


# ---------------- threshold ----------------

def test_global_threshold(image_u8):
    out = np.asarray(threshold.threshold(image_u8, 100, down=True))
    np.testing.assert_array_equal(out, (image_u8 <= 100).astype(np.uint8))


def test_otsu_bimodal():
    img = np.concatenate([np.full(500, 40.0), np.full(500, 200.0)])
    t = float(threshold.compute_otsu(img.reshape(20, 50)))
    assert 40 < t < 200


def test_local_mean_flat_is_background():
    img = np.full((20, 20), 100.0, np.float32)
    out = np.asarray(threshold.local_mean(img, 3, scale=0.95))
    # uniform image: I > mean*0.95 everywhere -> down-threshold gives 0
    assert out.sum() == 0


# ---------------- binary ----------------

def test_erode_dilate_roundtrip():
    img = np.zeros((15, 15), np.uint8)
    img[4:11, 4:11] = 1
    er = np.asarray(binary.erode4(img))
    assert er.sum() == 5 * 5
    di = np.asarray(binary.dilate4(er))
    assert di.sum() == 5 * 5 + 4 * 5  # plus 4-neighborhood ring


def test_label_blobs_two_components():
    img = np.zeros((16, 16), np.uint8)
    img[2:5, 2:5] = 1
    img[10:14, 9:15] = 1
    labels = binary.relabel_compact(binary.label_blobs(jnp.asarray(img)))
    assert labels.max() == 2
    assert (labels[2:5, 2:5] == labels[2, 2]).all()
    assert (labels[10:14, 9:15] == labels[10, 9]).all()
    assert labels[2, 2] != labels[10, 9]


def test_contour_external_square():
    img = np.zeros((10, 10), np.uint8)
    img[2:6, 3:8] = 1
    contours = binary.contour_external(img)
    assert len(contours) == 1
    c = contours[0]
    # perimeter of 4x5 rect = 2*(4+5) - 4 = 14 pixels
    assert len(c) == 14
    assert set(map(tuple, c)) == {(x, y) for y in range(2, 6) for x in range(3, 8)
                                  if y in (2, 5) or x in (3, 7)}


# ---------------- census ----------------

def test_census3x3_flat_zero():
    img = np.full((8, 8), 5.0, np.float32)
    out = np.asarray(census.dense3x3(img))
    np.testing.assert_array_equal(out, 0)


def test_census_hamming():
    a = jnp.asarray(np.array([[0b1010]], np.int32))
    b = jnp.asarray(np.array([[0b0110]], np.int32))
    assert int(census.hamming_distance(a, b)[0, 0]) == 2


# ---------------- interpolation ----------------

def test_bilinear_at_integer_coords(image_f32):
    ys = np.array([3.0, 10.0])
    xs = np.array([4.0, 20.0])
    got = np.asarray(interpolate.bilinear(image_f32, ys, xs))
    np.testing.assert_allclose(got, image_f32[[3, 10], [4, 20]], rtol=1e-6)


def test_bilinear_midpoint():
    img = np.array([[0.0, 1.0], [2.0, 3.0]], np.float32)
    got = float(interpolate.bilinear(img, 0.5, 0.5))
    np.testing.assert_allclose(got, 1.5)


def test_bicubic_reproduces_linear_ramp():
    img = np.tile(np.arange(16, dtype=np.float32), (16, 1))
    got = np.asarray(interpolate.bicubic(img, np.array([5.3]), np.array([7.25])))
    np.testing.assert_allclose(got, [7.25], rtol=1e-5)


def test_sample_rect_bilinear(image_f32):
    got = np.asarray(interpolate.sample_rect_bilinear(
        jnp.asarray(image_f32), jnp.array([10.0]), jnp.array([12.0]), 2))
    np.testing.assert_allclose(got[0], image_f32[8:13, 10:15], rtol=1e-5)


# ---------------- distort ----------------

def test_warp_identity(image_f32):
    my, mx = distort.make_warp_grid(lambda xs, ys: (xs, ys), *image_f32.shape)
    out = np.asarray(distort.warp(image_f32, my, mx))
    np.testing.assert_allclose(out, image_f32, rtol=1e-5)


def test_warp_affine_translation(image_f32):
    out = np.asarray(distort.warp_affine(image_f32, 1, 0, 0, 1, 2.0, 3.0))
    np.testing.assert_allclose(out[:-3, :-2], image_f32[3:, 2:], rtol=1e-5)


def test_scale_up_constant():
    img = np.full((8, 8), 4.0, np.float32)
    out = np.asarray(distort.scale(img, (16, 16)))
    np.testing.assert_allclose(out[:15, :15], 4.0, rtol=1e-6)


# ---------------- enhance ----------------

def test_equalize_histogram_spreads():
    img = np.clip(np.random.default_rng(0).normal(128, 10, (64, 64)), 0, 255).astype(np.uint8)
    out = np.asarray(enhance.equalize_histogram(img))
    assert out.std() > img.std()


def test_sharpen_constant_unchanged():
    img = np.full((10, 10), 50.0, np.float32)
    np.testing.assert_allclose(np.asarray(enhance.sharpen4(img)), img, rtol=1e-5)


# ---------------- color ----------------

def test_hsv_roundtrip():
    rng = np.random.default_rng(1)
    rgb = rng.uniform(0, 255, (32, 32, 3)).astype(np.float32)
    back = np.asarray(color.hsv_to_rgb(color.rgb_to_hsv(rgb)))
    np.testing.assert_allclose(back, rgb, rtol=1e-3, atol=1e-2)


def test_yuv_roundtrip():
    rng = np.random.default_rng(2)
    rgb = rng.uniform(0, 255, (16, 16, 3)).astype(np.float32)
    back = np.asarray(color.yuv_to_rgb(color.rgb_to_yuv(rgb)))
    np.testing.assert_allclose(back, rgb, rtol=1e-2, atol=0.5)


def test_lab_roundtrip():
    rng = np.random.default_rng(3)
    rgb = rng.uniform(0.05, 0.95, (16, 16, 3)).astype(np.float32)
    back = np.asarray(color.lab_to_rgb(color.rgb_to_lab(rgb)))
    np.testing.assert_allclose(back, rgb, rtol=1e-2, atol=1e-2)


# ---------------- pixel math ----------------

def test_histogram(image_u8):
    got = np.asarray(pm.histogram(image_u8.astype(np.float32), 0, 256, 256))
    want = np.bincount(image_u8.ravel(), minlength=256)
    np.testing.assert_array_equal(got, want)


def test_normalize_zero_mean(image_f32):
    out = np.asarray(pm.normalize_zero_mean_unit_var(image_f32))
    assert abs(out.mean()) < 1e-4
    np.testing.assert_allclose(out.std(), 1.0, rtol=1e-4)
