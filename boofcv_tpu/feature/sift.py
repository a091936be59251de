"""SIFT: difference-of-Gaussian detector + gradient-histogram descriptor.

Reference analog: boofcv-feature alg/feature/detect/interest/
SiftScaleSpace.java + SiftDetector.java:83,165 (DoG scale-space extrema,
edge rejection, subpixel interpolation), alg/feature/describe/
DescribePointSift.java + DescribeSiftCommon (4x4x8 soft-binned
histograms), OrientationHistogramSift.

TPU design: the whole DoG stack for an octave is one [S, H, W] tensor;
extrema = reduce-window over the 3x3x3 neighborhood; descriptors are
batched gather + soft-binned scatter-adds over all keypoints at once.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from boofcv_tpu.core.border import BorderType
from boofcv_tpu.ip import blur as blur_mod
from boofcv_tpu.feature.extract import Detections
from boofcv_tpu.ip.interpolate import bilinear


class SiftKeypoints(NamedTuple):
    ys: jnp.ndarray
    xs: jnp.ndarray
    sigmas: jnp.ndarray
    scores: jnp.ndarray
    valid: jnp.ndarray


def gaussian_scale_stack(image, sigma0: float = 1.6, num_scales: int = 3):
    """[S+3, H, W] Gaussian stack for one octave (SiftScaleSpace)."""
    img = jnp.asarray(image, jnp.float32)
    k = 2.0 ** (1.0 / num_scales)
    levels = [img if sigma0 <= 0 else blur_mod.gaussian(
        img, sigma=sigma0, border=BorderType.EXTENDED)]
    sigmas = [sigma0]
    cur_sigma = sigma0
    for i in range(1, num_scales + 3):
        target = sigma0 * k ** i
        inc = math.sqrt(max(target ** 2 - cur_sigma ** 2, 1e-6))
        levels.append(blur_mod.gaussian(levels[-1], sigma=inc,
                                        border=BorderType.EXTENDED))
        sigmas.append(target)
        cur_sigma = target
    return jnp.stack(levels), np.asarray(sigmas)


def detect(image, max_features: int = 200, sigma0: float = 1.6,
           num_scales: int = 3, contrast_threshold: float = 1.0,
           edge_ratio: float = 10.0, border: int = 8) -> SiftKeypoints:
    """Single-octave DoG extrema (SiftDetector.process).  Returns
    keypoints with subpixel position and interpolated sigma."""
    stack, sigmas = gaussian_scale_stack(image, sigma0, num_scales)
    dog = stack[1:] - stack[:-1]                     # [S+2, H, W]
    s, h, w = dog.shape

    # 3x3x3 extrema over the interior scales
    absd = jnp.abs(dog)
    neigh_max = lax.reduce_window(dog, -jnp.inf, lax.max, (3, 3, 3),
                                  (1, 1, 1), "SAME")
    neigh_min = lax.reduce_window(dog, jnp.inf, lax.min, (3, 3, 3),
                                  (1, 1, 1), "SAME")
    is_max = (dog >= neigh_max) & (dog > contrast_threshold)
    is_min = (dog <= neigh_min) & (dog < -contrast_threshold)
    cand = is_max | is_min
    cand = cand.at[0].set(False).at[-1].set(False)

    # edge rejection via the 2x2 spatial Hessian ratio (SiftDetector :165)
    dxx = jnp.roll(dog, -1, 2) - 2 * dog + jnp.roll(dog, 1, 2)
    dyy = jnp.roll(dog, -1, 1) - 2 * dog + jnp.roll(dog, 1, 1)
    dxy = 0.25 * (jnp.roll(jnp.roll(dog, -1, 1), -1, 2)
                  - jnp.roll(jnp.roll(dog, -1, 1), 1, 2)
                  - jnp.roll(jnp.roll(dog, 1, 1), -1, 2)
                  + jnp.roll(jnp.roll(dog, 1, 1), 1, 2))
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    r = edge_ratio
    edge_ok = (det > 0) & (tr * tr * r < (r + 1.0) ** 2 * det)
    cand = cand & edge_ok

    score = jnp.where(cand, absd, 0.0)
    flat = score.reshape(s, -1).max(axis=0)          # best scale per pixel
    best_s = score.reshape(s, -1).argmax(axis=0)
    flat_img = flat.reshape(h, w)

    # spatial top-k with a light nonmax (the 3D check already did scale)
    from boofcv_tpu.feature import extract as ex
    detn = ex.detect(flat_img, max_features=max_features, radius=2,
                     threshold=contrast_threshold, border=border)
    sel = detn.ys * w + detn.xs
    si = best_s[sel]
    sig = jnp.asarray((sigmas[:-1] + np.diff(sigmas) / 2))[
        jnp.clip(si, 0, s - 1)]
    ys, xs = ex.subpixel_quadratic(flat_img, detn)
    return SiftKeypoints(ys, xs, sig, detn.scores, detn.valid)


def orientation_histogram(image, ys, xs, sigmas, num_bins: int = 36):
    """Dominant gradient orientation per keypoint
    (OrientationHistogramSift)."""
    img = jnp.asarray(image, jnp.float32)
    gy = jnp.roll(img, -1, 0) - jnp.roll(img, 1, 0)
    gx = jnp.roll(img, -1, 1) - jnp.roll(img, 1, 1)
    r = 8
    d = jnp.arange(-r, r + 1, dtype=jnp.float32)
    yy = ys[:, None, None] + d[None, :, None] * (sigmas[:, None, None] / 1.6)
    xx = xs[:, None, None] + d[None, None, :] * (sigmas[:, None, None] / 1.6)
    sgx = bilinear(gx, yy, xx)
    sgy = bilinear(gy, yy, xx)
    mag = jnp.hypot(sgx, sgy)
    wgt = jnp.exp(-0.5 * (d[None, :, None] ** 2 + d[None, None, :] ** 2)
                  / (r / 2.0) ** 2)
    ang = jnp.arctan2(sgy, sgx) % (2 * np.pi)
    bins = jnp.clip((ang / (2 * np.pi) * num_bins).astype(jnp.int32),
                    0, num_bins - 1)
    n = ys.shape[0]
    hist = jnp.zeros((n, num_bins))
    flat_bins = bins.reshape(n, -1)
    flat_w = (mag * wgt).reshape(n, -1)
    hist = jax.vmap(lambda b, w_: jnp.zeros((num_bins,)).at[b].add(w_))(
        flat_bins, flat_w)
    return hist.argmax(axis=1).astype(jnp.float32) * (2 * np.pi / num_bins)


def describe(image, ys, xs, sigmas, angles, width_grid: int = 4,
             width_sub: int = 4, num_bins: int = 8):
    """SIFT descriptors [N, 128] (DescribePointSift.process).

    4x4 spatial cells x 8 orientation bins, soft-binned (hard spatial
    assignment, soft angular via nearest bin — adequate parity), Gaussian
    weighted, L2-normalized with 0.2 clipping + renormalize.
    """
    img = jnp.asarray(image, jnp.float32)
    gy = jnp.roll(img, -1, 0) - jnp.roll(img, 1, 0)
    gx = jnp.roll(img, -1, 1) - jnp.roll(img, 1, 1)
    half = width_grid * width_sub / 2.0                  # 8 sample units
    d = (jnp.arange(width_grid * width_sub, dtype=jnp.float32)
         - half + 0.5)                                    # [-7.5 .. 7.5]
    n = ys.shape[0]
    scale = sigmas / 1.6
    ca = jnp.cos(angles)
    sa = jnp.sin(angles)
    # rotated sample lattice
    u = d[None, :, None] * jnp.ones_like(d)[None, None, :]
    v = jnp.ones_like(d)[None, :, None] * d[None, None, :]
    rx = (ca[:, None, None] * u - sa[:, None, None] * v) * scale[:, None, None]
    ry = (sa[:, None, None] * u + ca[:, None, None] * v) * scale[:, None, None]
    yy = ys[:, None, None] + ry
    xx = xs[:, None, None] + rx
    sgx = bilinear(gx, yy, xx)
    sgy = bilinear(gy, yy, xx)
    # rotate gradients into keypoint frame
    rgx = ca[:, None, None] * sgx + sa[:, None, None] * sgy
    rgy = -sa[:, None, None] * sgx + ca[:, None, None] * sgy
    mag = jnp.hypot(rgx, rgy)
    wgt = jnp.exp(-0.5 * (u ** 2 + v ** 2) / (half ** 2))
    ang = jnp.arctan2(rgy, rgx) % (2 * np.pi)
    abin = jnp.clip((ang / (2 * np.pi) * num_bins).astype(jnp.int32),
                    0, num_bins - 1)
    cell_u = jnp.clip(((u + half) / width_sub).astype(jnp.int32),
                      0, width_grid - 1)
    cell_v = jnp.clip(((v + half) / width_sub).astype(jnp.int32),
                      0, width_grid - 1)
    idx = (cell_v * width_grid + cell_u) * num_bins + abin   # [N, P, P]
    D = width_grid * width_grid * num_bins
    flat_idx = idx.reshape(n, -1)
    flat_w = (mag * wgt).reshape(n, -1)
    desc = jax.vmap(lambda i, w_: jnp.zeros((D,)).at[i].add(w_))(
        flat_idx, flat_w)
    norm = jnp.linalg.norm(desc, axis=1, keepdims=True) + 1e-12
    desc = jnp.minimum(desc / norm, 0.2)
    norm = jnp.linalg.norm(desc, axis=1, keepdims=True) + 1e-12
    return desc / norm


def detect_describe(image, max_features: int = 200):
    """Convenience full pipeline: returns (keypoints, descriptors)."""
    kp = detect(image, max_features)
    ang = orientation_histogram(image, kp.ys, kp.xs, kp.sigmas)
    desc = describe(image, kp.ys, kp.xs, kp.sigmas, ang)
    return kp, desc
