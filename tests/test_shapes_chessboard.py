"""Shape-fitting + chessboard-detector oracles."""

import numpy as np
import jax.numpy as jnp

from boofcv_tpu.feature import shapes
from boofcv_tpu.ip import binary
from boofcv_tpu.recognition import chessboard


def test_fit_polygon_rectangle():
    img = np.zeros((40, 60), np.uint8)
    img[8:30, 10:50] = 1
    conts = binary.contour_external(img)
    assert len(conts) == 1
    corners = shapes.fit_polygon(conts[0], num_sides=4)
    assert len(corners) == 4
    want = {(10, 8), (49, 8), (49, 29), (10, 29)}
    got = {tuple(np.round(c).astype(int)) for c in corners}
    assert all(any(abs(a - c) <= 1 and abs(b - d) <= 1 for c, d in got)
               for a, b in want)
    assert shapes.polygon_is_convex(corners)


def test_fit_polygon_triangle():
    img = np.zeros((60, 60), np.uint8)
    for y in range(10, 50):
        half = (y - 10)
        img[y, 30 - half // 2: 30 + half // 2 + 1] = 1
    conts = binary.contour_external(img)
    corners = shapes.fit_polygon(conts[0], num_sides=3)
    assert len(corners) == 3


def test_fit_ellipse_exact():
    t = np.linspace(0, 2 * np.pi, 100, endpoint=False)
    a, b, phi = 12.0, 7.0, 0.4
    cx, cy = 31.0, 27.0
    x = cx + a * np.cos(t) * np.cos(phi) - b * np.sin(t) * np.sin(phi)
    y = cy + a * np.cos(t) * np.sin(phi) + b * np.sin(t) * np.cos(phi)
    fit = shapes.fit_ellipse(np.stack([x, y], 1))
    assert fit is not None
    np.testing.assert_allclose(fit["center"], (cx, cy), atol=1e-6)
    np.testing.assert_allclose(fit["a"], a, atol=1e-6)
    np.testing.assert_allclose(fit["b"], b, atol=1e-6)
    np.testing.assert_allclose(fit["phi"], phi, atol=1e-6)


def make_chessboard_image(rows, cols, sq=20, margin=30, noise=1.0):
    """Inner-corner counts (rows, cols): squares = (rows+1) x (cols+1)."""
    h = margin * 2 + (rows + 1) * sq
    w = margin * 2 + (cols + 1) * sq
    yy, xx = np.mgrid[0:h, 0:w]
    by = (yy - margin) // sq
    bx = (xx - margin) // sq
    inside = (yy >= margin) & (yy < h - margin) & (xx >= margin) & (xx < w - margin)
    img = np.where(inside & (((by + bx) % 2) == 0), 30.0, 220.0)
    img += np.random.default_rng(0).normal(0, noise, img.shape)
    # GT inner corners
    gt = np.array([[margin + (c + 1) * sq, margin + (r + 1) * sq]
                   for r in range(rows) for c in range(cols)], float)
    return img.astype(np.float32), gt


def test_chessboard_corner_detection():
    img, gt = make_chessboard_image(4, 5)
    ys, xs, valid = chessboard.detect_corners(img, max_corners=4 * 5)
    pts = np.stack([xs[valid], ys[valid]], 1)
    assert len(pts) == 20
    # every GT corner has a detection within 1px
    d = np.abs(pts[:, None, :] - (gt[None, :, :] - 0.5)).max(-1).min(0)
    assert (d < 1.5).all(), d.max()


def test_chessboard_full_grid():
    img, gt = make_chessboard_image(4, 5)
    grid = chessboard.detect_chessboard(img, rows=4, cols=5)
    assert grid is not None
    # row-major ordering within 1.5px of GT lattice (corner at k*sq - 0.5)
    d = np.abs(grid - (gt - 0.5)).max(-1)
    assert (d < 1.5).all(), d.max()
