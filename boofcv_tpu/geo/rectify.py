"""Stereo rectification.

Reference analog: boofcv-geo alg/geo/rectify/RectifyCalibrated.java:53
(calibrated Bouguet-style rectification), RectifyFundamental.java
(uncalibrated), and RectifyImageOps (warp-map creation + view adjustment).

Small host-side matrix math produces the rectifying homographies; the
per-pixel warp maps are dense jnp grids consumed by ip.distort.remap
(SURVEY §3.1: rectification is the HOT per-pixel warp in the VO loop —
maps are precomputed once and the warp is a batched bilinear gather).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp


class RectifiedPair(NamedTuple):
    """Output of calibrated rectification."""
    rect1: jnp.ndarray       # [3,3] rectifying homography for view 1 (pixels)
    rect2: jnp.ndarray       # [3,3]
    rectK: jnp.ndarray       # [3,3] rectified intrinsics (shared)
    rot1: jnp.ndarray        # [3,3] camera-1 rotation into rectified frame
    baseline: float          # rectified baseline (for disparity -> depth)


def rectify_calibrated(K1, K2, R, t) -> RectifiedPair:
    """Calibrated rectification (RectifyCalibrated.process).

    (R, t): transform from camera-1 to camera-2 frame (x2 = R x1 + t).
    Returns pixel->pixel rectifying homographies H_i = K_rect R_rect_i K_i^-1.
    """
    K1 = np.asarray(K1, np.float64)
    K2 = np.asarray(K2, np.float64)
    R = np.asarray(R, np.float64)
    t = np.asarray(t, np.float64)

    # camera-2 center in camera-1 frame
    c2 = -R.T @ t
    # new x-axis along the baseline
    e1 = c2 / np.linalg.norm(c2)
    # new y-axis orthogonal to x and old z
    z1 = np.array([0.0, 0.0, 1.0])
    e2 = np.cross(z1, e1)
    n2 = np.linalg.norm(e2)
    if n2 < 1e-12:  # degenerate: baseline along optical axis
        e2 = np.array([0.0, 1.0, 0.0])
    else:
        e2 = e2 / n2
    e3 = np.cross(e1, e2)
    Rrect = np.stack([e1, e2, e3], axis=0)   # rows

    # shared rectified intrinsics: average focal, centered
    f = (K1[0, 0] + K1[1, 1] + K2[0, 0] + K2[1, 1]) / 4.0
    cx = (K1[0, 2] + K2[0, 2]) / 2.0
    cy = (K1[1, 2] + K2[1, 2]) / 2.0
    Krect = np.array([[f, 0, cx], [0, f, cy], [0, 0, 1.0]])

    H1 = Krect @ Rrect @ np.linalg.inv(K1)
    H2 = Krect @ Rrect @ R.T @ np.linalg.inv(K2)
    baseline = float(np.linalg.norm(c2))
    return RectifiedPair(jnp.asarray(H1), jnp.asarray(H2), jnp.asarray(Krect),
                         jnp.asarray(Rrect), baseline)


def rectify_uncalibrated(F, p1, p2, width: int, height: int):
    """Uncalibrated (projective) stereo rectification from a fundamental
    matrix and the point pairs that produced it.

    Reference analog: RectifyFundamental.java:43 — Hartley's method
    (IJCV'99; Hartley & Zisserman p.305): a homography H sends the second
    epipole to infinity (translate center to origin -> rotate epipole
    onto +x -> projective G = I with G[2,0] = -1/f), the matching
    transform for the first image is H0 = H M with P2 = [M | m]
    extracted from F, then an affine Ha minimizes the x-disparity of the
    observations in a least-squares sense.

    p1, p2: [N, 2] pixel correspondences.  Returns (rect1, rect2) 3x3
    pixel homographies (numpy f64).  Raises ValueError when an epipole
    falls inside the image (rectification undefined — reference
    checkEpipoleInside).
    """
    from boofcv_tpu.geo import epipolar

    F = np.asarray(F, np.float64)
    p1 = np.asarray(p1, np.float64)
    p2 = np.asarray(p2, np.float64)
    e1, e2 = (np.asarray(e) for e in epipolar.epipoles_from_fundamental(
        jnp.asarray(F)))
    cx, cy = width // 2, height // 2
    for e in (e1, e2):
        x, y = e[0] / e[2], e[1] / e[2]
        if 0 <= x < width and 0 <= y < height:
            raise ValueError("epipole inside the image; projective "
                             "rectification is undefined")

    # H: send e2 to infinity
    T = np.eye(3)
    T[0, 2], T[1, 2] = -cx, -cy
    x = e2[0] / e2[2] - cx
    y = e2[1] / e2[2] - cy
    theta = np.arctan2(-y, x)
    c, s = np.cos(theta), np.sin(theta)
    R = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    f = np.hypot(x, y)
    G = np.eye(3)
    G[2, 0] = -1.0 / f
    H = G @ R @ T

    # matching transform: H0 = H M, M = [e2]x F + e2 v^T
    # (fundamentalToProjective with v chosen to keep M nonsingular)
    v = np.array([0.1, 0.5, 0.2])
    e2x = np.array([[0, -e2[2], e2[1]], [e2[2], 0, -e2[0]],
                    [-e2[1], e2[0], 0.0]])
    M = e2x @ F + np.outer(e2, v)
    H0 = H @ M

    # affine Ha minimizing sum (a k.x + b k.y + c - c.x)^2  (H&Z p.306)
    def apply(Hm, p):
        q = np.concatenate([p, np.ones((len(p), 1))], 1) @ Hm.T
        return q[:, :2] / q[:, 2:]

    k = apply(H0, p1)
    cc = apply(H, p2)
    A = np.concatenate([k, np.ones((len(k), 1))], 1)
    abc, *_ = np.linalg.lstsq(A, cc[:, 0], rcond=None)
    Ha = np.eye(3)
    Ha[0] = abc
    return Ha @ H0, H


def adjust_rectification(rect1, rect2, width: int, height: int):
    """Scale/translate both rectifying homographies so image-1's corners
    stay inside a width x height canvas (RectifyImageOps.fullViewLeft's
    role for the uncalibrated path).  The same affine is applied to both
    transforms, preserving the row-alignment property."""
    rect1 = np.asarray(rect1, np.float64)
    corners = np.array([[0, 0, 1], [width - 1, 0, 1],
                        [width - 1, height - 1, 1], [0, height - 1, 1.0]])
    q = corners @ rect1.T
    q = q[:, :2] / q[:, 2:]
    lo = q.min(axis=0)
    hi = q.max(axis=0)
    scale = min(width / (hi[0] - lo[0] + 1e-12),
                height / (hi[1] - lo[1] + 1e-12))
    A = np.array([[scale, 0, -lo[0] * scale],
                  [0, scale, -lo[1] * scale], [0, 0, 1.0]])
    return A @ rect1, A @ np.asarray(rect2, np.float64)


def rectify_maps(H, height: int, width: int):
    """Inverse warp maps for ip.distort.remap: for each output pixel, the
    source pixel H^-1 (x, y, 1) (RectifyImageOps.transformRectToPixel)."""
    from boofcv_tpu.geo.smalllinalg import inv3
    Hinv = inv3(jnp.asarray(H, jnp.float64))
    ys, xs = jnp.meshgrid(jnp.arange(height, dtype=jnp.float64),
                          jnp.arange(width, dtype=jnp.float64), indexing="ij")
    ones = jnp.ones_like(xs)
    pts = jnp.stack([xs, ys, ones], axis=-1) @ Hinv.T
    w = pts[..., 2]
    w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return (pts[..., 1] / w).astype(jnp.float32), (pts[..., 0] / w).astype(jnp.float32)


def disparity_to_depth(disp, rectK, baseline: float):
    """z = f * B / d with INVALID (<0) passed through as 0."""
    f = rectK[0, 0]
    safe = jnp.where(disp > 0, disp, 1.0)
    z = f * baseline / safe
    return jnp.where(disp > 0, z, 0.0)


def pixel_to_3d_rectified(xs, ys, disp, rectK, baseline: float):
    """Rectified pixel + disparity -> 3D in the rectified cam-1 frame
    (StereoSparse3D.process analog: X=(x-cx) B/d ...)."""
    f = rectK[0, 0]
    cx = rectK[0, 2]
    cy = rectK[1, 2]
    safe = jnp.where(disp > 0, disp, 1.0)
    z = f * baseline / safe
    x = (xs - cx) * z / f
    y = (ys - cy) * z / f
    return jnp.stack([x, y, z], axis=-1)
