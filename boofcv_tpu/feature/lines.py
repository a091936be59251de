"""Line detection: Hough transforms.

Reference analog: boofcv-feature alg/feature/detect/line/ —
HoughTransformBinary.java / HoughTransformGradient.java with polar
(HoughParametersPolar) and foot-of-norm parameterizations,
GridRansacLineDetector.

TPU design: the accumulator is a scatter-add over all edge pixels at
once ([N_pixels] -> [n_theta, n_rho] bincount); peaks via the standard
nonmax + top-k.  The gradient variant votes only along each pixel's
gradient direction.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from boofcv_tpu.feature import extract
from boofcv_tpu.ip import derivative


class HoughLines(NamedTuple):
    rho: jnp.ndarray      # [K] signed distance from center
    theta: jnp.ndarray    # [K] normal angle
    score: jnp.ndarray    # [K]
    valid: jnp.ndarray


def hough_binary(binary, n_theta: int = 180, n_rho: int = 181,
                 max_lines: int = 10, peak_radius: int = 2,
                 threshold_frac: float = 0.3) -> HoughLines:
    """Polar Hough over a binary edge image (HoughTransformBinary).

    rho is measured from the image center (as the reference does).
    """
    bw = jnp.asarray(binary) > 0
    h, w = bw.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    thetas = jnp.linspace(0.0, np.pi, n_theta, endpoint=False)
    max_r = float(np.hypot(max(cy, h - 1 - cy), max(cx, w - 1 - cx)))
    # rho index for every (pixel, theta)
    x0 = (xs - cx).ravel()
    y0 = (ys - cy).ravel()
    mask = bw.ravel()
    rho = (x0[:, None] * jnp.cos(thetas)[None, :]
           + y0[:, None] * jnp.sin(thetas)[None, :])     # [P, T]
    ri = jnp.clip(jnp.round((rho / max_r + 1.0) * 0.5 * (n_rho - 1)),
                  0, n_rho - 1).astype(jnp.int32)
    t_idx = jnp.broadcast_to(jnp.arange(n_theta)[None, :], ri.shape)
    flat = t_idx * n_rho + ri
    votes = jnp.broadcast_to(mask[:, None], ri.shape).astype(jnp.float32)
    acc = jnp.zeros((n_theta * n_rho,), jnp.float32).at[flat.ravel()].add(
        votes.ravel()).reshape(n_theta, n_rho)
    return _extract_lines(acc, thetas, max_r, n_rho, max_lines,
                          peak_radius, threshold_frac)


def hough_gradient(image, n_theta: int = 180, n_rho: int = 181,
                   max_lines: int = 10, peak_radius: int = 2,
                   edge_threshold: float = 20.0,
                   threshold_frac: float = 0.3) -> HoughLines:
    """Gradient-direction Hough (HoughTransformGradient): each edge pixel
    votes once, at the angle of its gradient."""
    img = jnp.asarray(image, jnp.float32)
    dx, dy = derivative.sobel(img)
    mag = jnp.hypot(dx, dy)
    h, w = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    theta = jnp.arctan2(dy, dx) % np.pi                      # normal angle
    max_r = float(np.hypot(max(cy, h - 1 - cy), max(cx, w - 1 - cx)))
    rho = (xs - cx) * jnp.cos(theta) + (ys - cy) * jnp.sin(theta)
    ti = jnp.clip((theta / np.pi * n_theta).astype(jnp.int32), 0, n_theta - 1)
    ri = jnp.clip(jnp.round((rho / max_r + 1.0) * 0.5 * (n_rho - 1)),
                  0, n_rho - 1).astype(jnp.int32)
    votes = (mag > edge_threshold).astype(jnp.float32)
    acc = jnp.zeros((n_theta * n_rho,), jnp.float32).at[
        (ti * n_rho + ri).ravel()].add(votes.ravel()).reshape(n_theta, n_rho)
    thetas = jnp.linspace(0.0, np.pi, n_theta, endpoint=False)
    return _extract_lines(acc, thetas, max_r, n_rho, max_lines,
                          peak_radius, threshold_frac)


def _extract_lines(acc, thetas, max_r, n_rho, max_lines, peak_radius,
                   threshold_frac):
    thr = threshold_frac * jnp.max(acc)
    det = extract.detect(acc, max_features=max_lines, radius=peak_radius,
                         threshold=thr)
    t = thetas[jnp.clip(det.ys, 0, thetas.shape[0] - 1)]
    r = (det.xs.astype(jnp.float32) / (n_rho - 1) * 2.0 - 1.0) * max_r
    return HoughLines(r, t, det.scores, det.valid)


def line_pixels(rho, theta, shape_hw, thickness: float = 1.0):
    """Boolean mask of the line for visualization/tests."""
    h, w = shape_hw
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    d = np.abs((xs - cx) * np.cos(theta) + (ys - cy) * np.sin(theta) - rho)
    return d <= thickness
