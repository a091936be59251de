"""Multi-band (Planar) wrapper layer vs explicit per-band loops."""

import numpy as np
import jax.numpy as jnp

from boofcv_tpu.ip import blur, derivative, planar, pyramid_ops
from boofcv_tpu.core.border import BorderType


def _rgb(h=40, w=52, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0, 255, (h, w, 3)).astype(np.float32))


def test_planar_blur_matches_band_loop():
    img = _rgb()
    out = planar.planar(blur.gaussian)(img, sigma=2.0)
    assert out.shape == img.shape
    for c in range(3):
        ref = blur.gaussian(img[..., c], sigma=2.0)
        assert np.allclose(np.asarray(out[..., c]), np.asarray(ref),
                           atol=1e-4)


def test_planar_sobel_tuple_output():
    img = _rgb(seed=1)
    dx, dy = planar.planar(derivative.sobel)(img)
    assert dx.shape == img.shape and dy.shape == img.shape
    rdx, rdy = derivative.sobel(img[..., 1])
    assert np.allclose(np.asarray(dx[..., 1]), np.asarray(rdx), atol=1e-4)
    assert np.allclose(np.asarray(dy[..., 1]), np.asarray(rdy), atol=1e-4)


def test_planar_passthrough_gray():
    g = _rgb()[..., 0]
    out = planar.planar(blur.mean)(g, 2)
    ref = blur.mean(g, 2)
    assert np.allclose(np.asarray(out), np.asarray(ref))


def test_per_band_pyramid_list_output():
    img = _rgb(h=48, w=64, seed=2)
    from boofcv_tpu.core.pyramid import PyramidConfig
    cfg = PyramidConfig(scales=(1, 2, 4))
    levels = planar.per_band(
        lambda b: pyramid_ops.pyramid_discrete(b, cfg), img)
    assert len(levels) == 3
    assert levels[0].shape == img.shape
    assert levels[1].shape[:2] == (24, 32) and levels[1].shape[2] == 3
    ref1 = pyramid_ops.pyramid_discrete(img[..., 2], cfg)[1]
    assert np.allclose(np.asarray(levels[1][..., 2]), np.asarray(ref1),
                       atol=1e-4)


def test_split_merge_average():
    img = _rgb(seed=3)
    bands = planar.split_bands(img)
    assert len(bands) == 3 and bands[0].shape == img.shape[:2]
    back = planar.merge_bands(bands)
    assert np.array_equal(np.asarray(back), np.asarray(img))
    avg = planar.average_bands(img)
    assert np.allclose(np.asarray(avg),
                       np.asarray(img).mean(axis=-1), atol=1e-4)
