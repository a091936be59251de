"""Chessboard calibration-target detection.

Reference analog: boofcv-recognition abst/fiducial/calib/
CalibrationDetectorChessboard + boofcv-feature alg/feature/detect/chess/
DetectChessboardCorners2.java (XCornerAbeles2019Intensity x-corner
response, corner graph assembly into a grid).

TPU design: the x-corner intensity is a fixed ring-sample stencil over
the blurred image (batched for all pixels); subpixel refinement reuses
extract.subpixel_quadratic; grid assembly (ordering corners into rows x
cols) is a small host-side nearest-neighbor walk.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from boofcv_tpu.ip import blur as blur_mod
from boofcv_tpu.core.border import BorderType, pad
from boofcv_tpu.feature import extract


def xcorner_intensity(image) -> jnp.ndarray:
    """X-corner response (XCornerAbeles2019Intensity analog).

    Samples a radius-2-ish ring at 4 'a' points (diagonal) and 4 'b'
    points (axis-aligned): a chessboard corner has a+c similar, b+d
    similar, and the two pairs very different.
    response = (a1+a3-b2-b4)^2-ish combination; we use the product form
    (a1-m)(a3-m) + (b2-m)(b4-m) with m = local mean, positive at
    x-corners of either polarity.
    """
    img = blur_mod.gaussian(jnp.asarray(image, jnp.float32), sigma=1.0,
                            border=BorderType.EXTENDED)
    p = pad(img, 2, 2, BorderType.EXTENDED)
    h, w = img.shape

    def s(dy, dx):
        return p[2 + dy:2 + dy + h, 2 + dx:2 + dx + w]

    a1 = s(-2, -2)
    a2 = s(-2, 2)
    a3 = s(2, 2)
    a4 = s(2, -2)
    b1 = s(-2, 0)
    b2 = s(0, 2)
    b3 = s(2, 0)
    b4 = s(0, -2)
    mean = (a1 + a2 + a3 + a4 + b1 + b2 + b3 + b4) / 8.0
    # diagonal pair vs axis pair, both polarities
    r1 = (a1 - mean) * (a3 - mean) + (a2 - mean) * (a4 - mean) \
        - (b1 - mean) * (b3 - mean) - (b2 - mean) * (b4 - mean)
    r2 = -((a1 - mean) * (a3 - mean) + (a2 - mean) * (a4 - mean)) \
        + (b1 - mean) * (b3 - mean) + (b2 - mean) * (b4 - mean)
    return jnp.maximum(r1, r2)


def detect_corners(image, max_corners: int = 200, threshold_frac: float = 0.1):
    """X-corner detection + subpixel (DetectChessboardCorners2.process)."""
    inten = xcorner_intensity(image)
    thr = threshold_frac * float(jnp.max(inten))
    det = extract.detect(inten, max_features=max_corners, radius=3,
                         threshold=thr, border=4)
    ys, xs = extract.subpixel_quadratic(inten, det)
    return np.asarray(ys), np.asarray(xs), np.asarray(det.valid)


def assemble_grid(ys, xs, valid, rows: int, cols: int):
    """Order detected x-corners into a rows x cols grid (host-side analog
    of the reference's chessboard corner-graph clustering).

    Works for mildly distorted boards: estimates the dominant lattice
    directions from nearest-neighbor displacement clustering, then sorts
    corners into lattice coordinates.  Returns [rows*cols, 2] (x, y) in
    row-major order, or None if the expected count is missing.
    """
    pts = np.stack([xs[valid], ys[valid]], 1)
    n = rows * cols
    if len(pts) < n:
        return None
    # keep the n strongest is implicit (detect returns by score); if too
    # many, keep the n closest to the centroid cluster by robust distance
    if len(pts) > n:
        c = np.median(pts, axis=0)
        d = np.linalg.norm(pts - c, axis=1)
        pts = pts[np.argsort(d)[:n]]
    return _order_grid(pts, rows, cols)


def _order_grid(pts, rows, cols):
    # principal axes via PCA of displacements to 4 nearest neighbors
    d2 = ((pts[:, None] - pts[None, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    nn = np.argsort(d2, axis=1)[:, :4]
    disp = (pts[nn] - pts[:, None]).reshape(-1, 2)
    # cluster displacement directions (mod 180deg): use the most common
    ang = np.arctan2(disp[:, 1], disp[:, 0]) % np.pi
    hist, edges = np.histogram(ang, bins=36)
    a0 = edges[np.argmax(hist)] + (edges[1] - edges[0]) / 2
    u = np.array([np.cos(a0), np.sin(a0)])
    # canonicalize directions (a chessboard has 180-degree ambiguity;
    # report the orientation with u ~ +x, v ~ +y)
    if u[0] < 0 or (abs(u[0]) < 1e-9 and u[1] < 0):
        u = -u
    v = np.array([-u[1], u[0]])
    if v[1] < 0:
        v = -v
    # lattice coordinates = projections, ranked
    pu = pts @ u
    pv = pts @ v
    # decide orientation: more columns along u if cols >= rows
    order = np.lexsort((pu, np.round((pv - pv.min()) /
                                     ((pv.max() - pv.min()) / max(rows - 1, 1) + 1e-9))))
    grid = pts[order]
    # rank rows by pv bands
    band = np.round((pv - pv.min()) / ((pv.max() - pv.min()) /
                                       max(rows - 1, 1) + 1e-9)).astype(int)
    out = np.zeros((rows * cols, 2))
    ok = True
    for r in range(rows):
        sel = band == r
        if sel.sum() != cols:
            ok = False
            break
        row_pts = pts[sel]
        row_pts = row_pts[np.argsort(row_pts @ u)]
        out[r * cols:(r + 1) * cols] = row_pts
    if not ok:
        return None
    return out


def detect_chessboard(image, rows: int, cols: int, max_corners: int = 300):
    """Full pipeline: x-corners -> subpixel -> grid (CalibrationDetector-
    Chessboard.process).  rows/cols = INNER corner counts.  Returns
    [rows*cols, 2] (x, y) or None."""
    ys, xs, valid = detect_corners(image, max_corners)
    # detections come score-ordered (top_k): keep the n strongest
    pts = np.stack([xs[valid], ys[valid]], 1)
    n = rows * cols
    if len(pts) < n:
        return None
    pts = pts[:n]
    return _order_grid(pts, rows, cols)
