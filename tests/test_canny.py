"""Canny edge family vs a naive-loop numpy oracle.

Mirrors the reference's test style for CannyEdge/HysteresisEdgeTrace*:
the device pipeline (fused stencils + while-loop hysteresis) must agree
with a direct per-pixel implementation of the same math.
"""

import numpy as np
import jax.numpy as jnp

from boofcv_tpu.core.kernel import gaussian_kernel
from boofcv_tpu.feature.canny import canny, edge_contours


def _naive_blur_normalized(img, k):
    """Separable conv with edge-renormalized kernel (NORMALIZED border)."""
    r = len(k) // 2
    h, w = img.shape
    tmp = np.zeros_like(img)
    for y in range(h):
        for x in range(w):
            s = wsum = 0.0
            for i, kv in enumerate(k):
                xx = x + i - r
                if 0 <= xx < w:
                    s += kv * img[y, xx]
                    wsum += kv
            tmp[y, x] = s / wsum
    out = np.zeros_like(img)
    for y in range(h):
        for x in range(w):
            s = wsum = 0.0
            for i, kv in enumerate(k):
                yy = y + i - r
                if 0 <= yy < h:
                    s += kv * tmp[yy, x]
                    wsum += kv
            out[y, x] = s / wsum
    return out


def _naive_sobel(img):
    p = np.pad(img, 1, mode="edge")
    h, w = img.shape
    dx = np.zeros_like(img)
    dy = np.zeros_like(img)
    kx = np.outer([1, 2, 1], [-1, 0, 1]).astype(np.float64)
    ky = kx.T
    for y in range(h):
        for x in range(w):
            win = p[y:y + 3, x:x + 3]
            dx[y, x] = np.sum(win * kx)
            dy[y, x] = np.sum(win * ky)
    return dx, dy


def _naive_canny(img, low, high, radius=2):
    k = np.asarray(gaussian_kernel(-1.0, radius), np.float64)
    blurred = _naive_blur_normalized(np.asarray(img, np.float64), k)
    dx, dy = _naive_sobel(blurred)
    inten = np.hypot(dx, dy)
    theta = np.arctan2(dy, dx)
    theta = np.where(theta < 0, theta + np.pi, theta)
    sector = np.floor((theta + np.pi / 8) / (np.pi / 4)).astype(int) % 4
    pairs = [((0, -1), (0, 1)), ((-1, -1), (1, 1)),
             ((-1, 0), (1, 0)), ((-1, 1), (1, -1))]
    h, w = img.shape
    nms = np.zeros_like(inten)
    for y in range(h):
        for x in range(w):
            (ay, ax), (by, bx) = pairs[sector[y, x]]

            def at(yy, xx):
                if 0 <= yy < h and 0 <= xx < w:
                    return inten[yy, xx]
                return 0.0

            if inten[y, x] > at(y + ay, x + ax) and \
                    inten[y, x] >= at(y + by, x + bx):
                nms[y, x] = inten[y, x]
    # hysteresis: BFS from strong through weak
    weak = nms >= low
    out = nms >= high
    stack = list(zip(*np.nonzero(out)))
    while stack:
        y, x = stack.pop()
        for ddy in (-1, 0, 1):
            for ddx in (-1, 0, 1):
                ny, nx = y + ddy, x + ddx
                if 0 <= ny < h and 0 <= nx < w and weak[ny, nx] \
                        and not out[ny, nx]:
                    out[ny, nx] = True
                    stack.append((ny, nx))
    return nms, out.astype(np.uint8)


def test_canny_matches_naive_oracle():
    rng = np.random.default_rng(7)
    # smooth random image: random blobs + smooth gradient (no exact ties)
    yy, xx = np.mgrid[0:48, 0:56].astype(np.float64)
    img = 20 + 0.3 * xx + 0.1 * yy
    for _ in range(6):
        cy, cx = rng.uniform(5, 43), rng.uniform(5, 51)
        a = rng.uniform(40, 120)
        s = rng.uniform(2, 6)
        img += a * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
    img += rng.normal(0, 0.5, img.shape)

    low, high = 3.0, 12.0
    nms_oracle, mask_oracle = _naive_canny(img, low, high)
    mask = np.asarray(canny(jnp.asarray(img), low, high, radius=2))

    # fp summation-order differences can flip >=-ties at near-equal
    # intensities; require agreement away from near-tie/threshold margins
    margin = np.minimum(np.abs(nms_oracle - low), np.abs(nms_oracle - high))
    decisive = margin > 1e-6
    mismatch = (mask != mask_oracle) & decisive
    assert mismatch.sum() <= max(2, 0.002 * mask.size), \
        f"{mismatch.sum()} decisive mismatches"


def test_canny_rectangle_thin_closed_edge():
    img = np.zeros((64, 80), np.float32)
    img[16:48, 20:60] = 100.0
    mask = np.asarray(canny(jnp.asarray(img), 10.0, 40.0, radius=2))
    ys, xs = np.nonzero(mask)
    assert len(ys) > 0
    # all edge pixels within 3 px of the true rectangle boundary
    def dist_to_boundary(y, x):
        inside_y = min(abs(y - 15.5), abs(y - 47.5))
        inside_x = min(abs(x - 19.5), abs(x - 59.5))
        if 15.5 <= y <= 47.5 and 19.5 <= x <= 59.5:
            return min(inside_y, inside_x)
        return max(min(inside_y, inside_x), 0)
    assert all(dist_to_boundary(y, x) < 3.5 for y, x in zip(ys, xs))
    # thin: no 2x2 block fully set away from corners
    blocks = mask[:-1, :-1] & mask[1:, :-1] & mask[:-1, 1:] & mask[1:, 1:]
    assert blocks.sum() <= 8
    # covers all four sides
    assert (mask[:, 40] > 0).sum() >= 2 and (mask[32, :] > 0).sum() >= 2


def test_canny_relative_thresholds():
    img = np.zeros((48, 48), np.float32)
    img[12:36, 12:36] = 80.0
    m = np.asarray(canny(jnp.asarray(img), 0.1, 0.4, relative=True))
    assert m.sum() > 0


def test_edge_contours_cover_mask_with_adjacency():
    img = np.zeros((64, 80), np.float32)
    img[16:48, 20:60] = 100.0
    mask = np.asarray(canny(jnp.asarray(img), 10.0, 40.0))
    chains = edge_contours(mask)
    total = sum(len(c) for c in chains)
    assert total == int((mask > 0).sum())
    for c in chains:
        d = np.abs(np.diff(c, axis=0))
        assert d.size == 0 or int(d.max()) <= 1   # 8-connected steps


def test_canny_diagonal_edges_not_suppressed():
    """Regression: sectors 1/3 compared along the iso-contour (swapped
    neighbor pairs), suppressing diagonal edges almost entirely."""
    img45 = np.where(np.add.outer(np.arange(64), np.arange(64)) > 60,
                     100.0, 0.0).astype(np.float32)
    img135 = img45[:, ::-1].copy()
    imgv = np.zeros((64, 64), np.float32)
    imgv[:, 32:] = 100.0
    n_v = int(np.asarray(canny(jnp.asarray(imgv), 10.0, 40.0)).sum())
    for d in (img45, img135):
        n_d = int(np.asarray(canny(jnp.asarray(d), 10.0, 40.0)).sum())
        # a diagonal edge is sqrt(2) longer; it must be at least
        # comparable to the vertical edge, not ~5x shorter
        assert n_d > 0.9 * n_v, (n_d, n_v)


def test_canny_relative_flat_frame_empty():
    flat = np.full((40, 50), 37.0, np.float32)
    m = np.asarray(canny(jnp.asarray(flat), 0.1, 0.4, relative=True))
    assert m.sum() == 0
