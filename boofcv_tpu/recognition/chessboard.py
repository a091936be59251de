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


def _convex_hull(pts):
    """Andrew monotone chain; returns hull vertices counter-clockwise."""
    p = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def cross(o, a, b):
        return ((a[0] - o[0]) * (b[1] - o[1])
                - (a[1] - o[1]) * (b[0] - o[0]))

    lower, upper = [], []
    for q in p:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], q) <= 0:
            lower.pop()
        lower.append(q)
    for q in p[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], q) <= 0:
            upper.pop()
        upper.append(q)
    return np.asarray(lower[:-1] + upper[:-1])


def _order_grid(pts, rows, cols):
    """Perspective-robust lattice ordering: find the 4 extreme corners on
    the convex hull (max-area quad), fit the grid->image homography for
    each cyclic corner assignment, and accept the one under which every
    corner rounds to a unique in-range lattice cell.  Exact under full
    projective distortion (the reference's corner-graph clustering plays
    the same role)."""
    from itertools import combinations
    from boofcv_tpu.geo import epipolar
    import jax.numpy as jnp

    n = rows * cols
    if len(pts) != n:
        return None
    hull = _convex_hull(pts)
    if len(hull) < 4:
        return None
    best_quad, best_area = None, -1.0
    for comb in combinations(range(len(hull)), 4):
        q = hull[list(comb)]
        area = 0.5 * abs(sum(
            q[i][0] * q[(i + 1) % 4][1] - q[(i + 1) % 4][0] * q[i][1]
            for i in range(4)))
        if area > best_area:
            best_area, best_quad = area, q

    grid_corners = np.array([[0.0, 0.0], [cols - 1.0, 0.0],
                             [cols - 1.0, rows - 1.0], [0.0, rows - 1.0]])
    candidates = []
    for k in range(4):
        quad = np.roll(best_quad, -k, axis=0)
        H = np.asarray(epipolar.homography_dlt(
            jnp.asarray(grid_corners[None]), jnp.asarray(quad[None])))[0]
        Hinv = np.linalg.inv(H)
        ph = np.concatenate([pts, np.ones((n, 1))], 1) @ Hinv.T
        lat = ph[:, :2] / ph[:, 2:]
        ij = np.round(lat).astype(int)
        if np.abs(lat - ij).max() > 0.35:
            continue
        if ij[:, 0].min() < 0 or ij[:, 0].max() >= cols or \
           ij[:, 1].min() < 0 or ij[:, 1].max() >= rows:
            continue
        flat = ij[:, 1] * cols + ij[:, 0]
        if len(set(flat.tolist())) != n:
            continue
        out = np.zeros((n, 2))
        out[flat] = pts
        candidates.append((quad[0], out))
    if not candidates:
        return None
    # canonical orientation among valid candidates: grid origin at the
    # quad corner with the smallest x+y (the board's 180-degree ambiguity
    # is inherent; this picks a deterministic one)
    candidates.sort(key=lambda c: c[0][0] + c[0][1])
    return candidates[0][1]


def detect_chessboard(image, rows: int, cols: int, max_corners: int = 300):
    """Full pipeline: x-corners -> subpixel -> ring validation -> grid
    (CalibrationDetectorChessboard.process).  rows/cols = INNER corner
    counts.  Returns [rows*cols, 2] (x, y) or None."""
    ys, xs, valid = detect_corners(image, max_corners)
    pts = np.stack([xs[valid], ys[valid]], 1)
    n = rows * cols
    if len(pts) < n:
        return None
    # ring validation rejects noise peaks / board-boundary junctions that
    # can outscore true x-corners on real imagery
    ok = validate_xcorners(image, pts[:, 1], pts[:, 0])
    if ok.sum() >= n:
        pts = pts[ok]
    if len(pts) > n:
        # detections are score-ordered; among validated corners prefer the
        # spatially-coherent subset around the centroid
        c = np.median(pts, axis=0)
        d = np.linalg.norm(pts - c, axis=1)
        pts = pts[np.argsort(d)[:n]]
    grid = _order_grid(pts, rows, cols)
    if grid is None and len(pts) == n:
        return None
    return grid


def validate_xcorners(image, ys, xs, radius: float = 4.5,
                      n_samples: int = 16):
    """Ring-sample x-corner validation (DetectChessboardCorners2's
    intensity-circle check, batched).

    A true x-corner shows four alternating dark/light arcs around a small
    circle — its ring intensity is dominated by the SECOND circular
    harmonic.  Edge points, L-corners and board-boundary junctions carry a
    strong first harmonic instead.  Returns a bool mask.
    """
    from boofcv_tpu.ip import interpolate

    th = jnp.arange(n_samples) * (2.0 * jnp.pi / n_samples)
    sy = jnp.asarray(ys)[:, None] + radius * jnp.sin(th)[None, :]
    sx = jnp.asarray(xs)[:, None] + radius * jnp.cos(th)[None, :]
    v = interpolate.bilinear(jnp.asarray(image, jnp.float32), sy, sx)
    v = v - jnp.mean(v, axis=1, keepdims=True)

    def harm(k):
        c = jnp.sum(v * jnp.cos(k * th)[None, :], axis=1)
        s = jnp.sum(v * jnp.sin(k * th)[None, :], axis=1)
        return c * c + s * s

    a1 = harm(1)
    a2 = harm(2)
    energy = jnp.sum(v * v, axis=1)
    # pure 2nd harmonic gives a2 = (n/2) * energy; require the 2nd
    # harmonic to dominate the 1st and carry most of the ring energy
    return np.asarray((a2 > 2.0 * a1)
                      & (a2 > 0.3 * (n_samples / 2.0) * energy))
