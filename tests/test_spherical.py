"""Spherical / equirectangular transforms (alg/distort/spherical analog)."""

import numpy as np
import jax.numpy as jnp

from boofcv_tpu.geo import cameras, spherical


def _smooth_equi(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = 50 + 30 * np.sin(2 * np.pi * xx / w * 3) * np.cos(np.pi * yy / h)
    for _ in range(4):
        cy, cx = rng.uniform(h * 0.2, h * 0.8), rng.uniform(0, w)
        img += 60 * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / 200.0)
    return jnp.asarray(img)


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def test_equi_unit_round_trip():
    rng = np.random.default_rng(1)
    w, h = 256, 128
    x = jnp.asarray(rng.uniform(0, w, 500))
    y = jnp.asarray(rng.uniform(1, h - 2, 500))
    v = spherical.equi_to_unit(x, y, w, h)
    assert np.allclose(np.linalg.norm(np.asarray(v), axis=-1), 1, atol=1e-5)
    x2, y2 = spherical.unit_to_equi(v, w, h)
    assert np.allclose(np.mod(np.asarray(x2) - np.asarray(x) + w / 2, w)
                       - w / 2, 0, atol=1e-3)
    assert np.allclose(np.asarray(y2), np.asarray(y), atol=1e-3)


def test_equi_center_pixel_looks_forward():
    v = spherical.equi_to_unit(jnp.asarray(128.0), jnp.asarray(63.5),
                               256, 128)
    assert np.allclose(np.asarray(v), [0, 0, 1], atol=1e-6)


def test_equi_rotate_round_trip():
    img = _smooth_equi(96, 192)
    R = _rot_y(0.7) @ np.array([[1, 0, 0],
                                [0, np.cos(0.3), -np.sin(0.3)],
                                [0, np.sin(0.3), np.cos(0.3)]])
    back = spherical.equi_rotate(spherical.equi_rotate(img, R), R.T)
    a = np.asarray(img)[20:-20, :]
    b = np.asarray(back)[20:-20, :]
    assert np.median(np.abs(a - b)) < 2.0


def test_pinhole_to_equi_to_pinhole_round_trip():
    cam = cameras.CameraPinhole(fx=150, fy=150, cx=79.5, cy=59.5,
                                width=160, height=120)
    rng = np.random.default_rng(2)
    yy, xx = np.mgrid[0:120, 0:160].astype(np.float32)
    view = 60 + 40 * np.sin(xx / 11.0) * np.cos(yy / 7.0)
    view = jnp.asarray(view + rng.normal(0, 0.1, view.shape))
    R = _rot_y(0.5)
    canvas = spherical.camera_to_equi(view, cam, R, (256, 512))
    assert float(jnp.sum(canvas > 0)) > 2000      # view covers a patch
    back = spherical.equi_to_pinhole(canvas, cam, R, (120, 160))
    a = np.asarray(view)[20:-20, 20:-20]
    b = np.asarray(back)[20:-20, 20:-20]
    assert np.median(np.abs(a - b)) < 2.5


def test_fisheye_to_equi_covers_hemisphere():
    omni = cameras.CameraUniversalOmni(
        fx=140, fy=140, cx=149.5, cy=149.5, width=300, height=300,
        mirror_offset=1.0)
    yy, xx = np.mgrid[0:300, 0:300].astype(np.float32)
    fe = jnp.asarray(100 + 50 * np.sin(xx / 17.0) * np.sin(yy / 13.0))
    canvas = spherical.camera_to_equi(fe, omni, np.eye(3), (128, 256))
    cov = float(jnp.mean((canvas != 0)))
    assert cov > 0.4                               # > hemisphere-ish


def test_multi_camera_to_equi_blends_two_views():
    cam = cameras.CameraPinhole(fx=80, fy=80, cx=79.5, cy=59.5,
                                width=160, height=120)
    yy, xx = np.mgrid[0:120, 0:160].astype(np.float32)
    img = jnp.asarray(np.full((120, 160), 100.0, np.float32))
    canvas = spherical.multi_camera_to_equi(
        [img, img], [cam, cam], [_rot_y(0.0), _rot_y(1.0)], (128, 256))
    c = np.asarray(canvas)
    assert (c > 0).mean() > 0.15
    # blended region keeps the constant value (weights normalize)
    assert np.allclose(c[c > 50], 100.0, atol=1.0)


def test_narrow_wide_point_round_trip():
    narrow = cameras.CameraPinhole(fx=300, fy=300, cx=159.5, cy=119.5,
                                   width=320, height=240)
    wide = cameras.CameraUniversalOmni(
        fx=130, fy=130, cx=199.5, cy=199.5, width=400, height=400,
        mirror_offset=0.8)
    f = spherical.narrow_to_wide(narrow, wide)
    g = spherical.wide_to_narrow(wide, narrow)
    rng = np.random.default_rng(3)
    xs = jnp.asarray(rng.uniform(40, 280, 64))
    ys = jnp.asarray(rng.uniform(40, 200, 64))
    wx, wy = f(xs, ys)
    bx, by = g(wx, wy)
    assert np.allclose(np.asarray(bx), np.asarray(xs), atol=1e-2)
    assert np.allclose(np.asarray(by), np.asarray(ys), atol=1e-2)
