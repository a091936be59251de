"""Camera models & lens distortion.

Reference analog: boofcv-geo struct/calib/CameraPinholeBrown.java,
alg/distort/brown/AddBrownPtoN_F64.java / RemoveBrownPtoN_F64.java,
LensDistortionOps.  Pinhole + Brown radial-tangential; forward (norm ->
distorted pixel) is closed-form, inverse is fixed-count Newton iteration
(jit-friendly).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Tuple

import jax.numpy as jnp


@dataclass(frozen=True)
class CameraPinhole:
    """Intrinsics (struct/calib/CameraPinhole.java)."""
    fx: float
    fy: float
    cx: float
    cy: float
    skew: float = 0.0
    width: int = 0
    height: int = 0

    def K(self, dtype=jnp.float64) -> jnp.ndarray:
        return jnp.array([[self.fx, self.skew, self.cx],
                          [0.0, self.fy, self.cy],
                          [0.0, 0.0, 1.0]], dtype=dtype)


@dataclass(frozen=True)
class CameraPinholeBrown(CameraPinhole):
    """Pinhole + Brown radial (r1..) & tangential (t1, t2) distortion
    (struct/calib/CameraPinholeBrown.java)."""
    radial: Tuple[float, ...] = (0.0, 0.0)
    t1: float = 0.0
    t2: float = 0.0


def pixel_to_norm(cam: CameraPinhole, px, py):
    """Pixel -> normalized image coords (PerspectiveOps.convertPixelToNorm)."""
    ny = (py - cam.cy) / cam.fy
    nx = (px - cam.cx - cam.skew * ny) / cam.fx
    return nx, ny


def norm_to_pixel(cam: CameraPinhole, nx, ny):
    px = cam.fx * nx + cam.skew * ny + cam.cx
    py = cam.fy * ny + cam.cy
    return px, py


def distort_norm(cam: CameraPinholeBrown, nx, ny):
    """Apply Brown distortion in normalized coords (AddBrownPtoN forward
    model): x_d = x(1 + sum k_i r^2i) + tangential."""
    r2 = nx * nx + ny * ny
    radial = jnp.zeros_like(r2)
    rpow = r2
    for k in cam.radial:
        radial = radial + k * rpow
        rpow = rpow * r2
    xd = nx * (1.0 + radial) + 2.0 * cam.t1 * nx * ny + cam.t2 * (r2 + 2.0 * nx * nx)
    yd = ny * (1.0 + radial) + cam.t1 * (r2 + 2.0 * ny * ny) + 2.0 * cam.t2 * nx * ny
    return xd, yd


def undistort_norm(cam: CameraPinholeBrown, xd, yd, iterations: int = 20):
    """Invert Brown distortion by fixed-point iteration
    (RemoveBrownPtoN_F64 uses the same scheme)."""
    nx, ny = xd, yd
    for _ in range(iterations):
        r2 = nx * nx + ny * ny
        radial = jnp.zeros_like(r2)
        rpow = r2
        for k in cam.radial:
            radial = radial + k * rpow
            rpow = rpow * r2
        dx = 2.0 * cam.t1 * nx * ny + cam.t2 * (r2 + 2.0 * nx * nx)
        dy = cam.t1 * (r2 + 2.0 * ny * ny) + 2.0 * cam.t2 * nx * ny
        nx = (xd - dx) / (1.0 + radial)
        ny = (yd - dy) / (1.0 + radial)
    return nx, ny


def project(cam: CameraPinholeBrown, X):
    """World-in-camera 3D points [..., 3] -> distorted pixels (px, py).

    The reference's BundlePinholeBrown camera-model projection.
    """
    nx = X[..., 0] / X[..., 2]
    ny = X[..., 1] / X[..., 2]
    xd, yd = distort_norm(cam, nx, ny)
    return norm_to_pixel(cam, xd, yd)


def pixel_to_norm_undistorted(cam: CameraPinholeBrown, px, py):
    """Distorted pixel -> undistorted normalized coords (the VO front-end
    transform, LensDistortionOps narrow-FOV pixel_to_norm)."""
    xd, yd = pixel_to_norm(cam, px, py)
    return undistort_norm(cam, xd, yd)


@dataclass(frozen=True)
class CameraUniversalOmni(CameraPinholeBrown):
    """Unified omnidirectional (fisheye/catadioptric) model
    (struct/calib/CameraUniversalOmni.java): 3D ray -> unit sphere ->
    offset by ``mirror_offset`` along +z -> pinhole + Brown distortion.
    mirror_offset = 0 reduces to pinhole; ~1 models ultra-wide FOV."""
    mirror_offset: float = 0.0


def omni_project(cam: CameraUniversalOmni, X):
    """3D points in camera frame [..., 3] -> distorted pixels
    (UniOmniPtoS inverse direction, alg/distort/universal/)."""
    n = jnp.sqrt(jnp.sum(X * X, axis=-1))
    n = jnp.where(n < 1e-12, 1.0, n)
    sx = X[..., 0] / n
    sy = X[..., 1] / n
    sz = X[..., 2] / n + cam.mirror_offset
    nx = sx / sz
    ny = sy / sz
    xd, yd = distort_norm(cam, nx, ny)
    return norm_to_pixel(cam, xd, yd)


def omni_pixel_to_unit(cam: CameraUniversalOmni, px, py,
                       iterations: int = 20):
    """Distorted pixel -> unit 3D ray (UniOmniStoP forward direction):
    undistort to the normalized plane, then lift back through the unit
    sphere with the closed-form UCM inverse."""
    xd, yd = pixel_to_norm(cam, px, py)
    nx, ny = undistort_norm(cam, xd, yd, iterations)
    xi = cam.mirror_offset
    r2 = nx * nx + ny * ny
    f = (xi + jnp.sqrt(1.0 + (1.0 - xi * xi) * r2)) / (1.0 + r2)
    sx = f * nx
    sy = f * ny
    sz = f - xi
    return jnp.stack([sx, sy, sz], axis=-1)


@dataclass(frozen=True)
class StereoParameters:
    """Stereo rig (struct/calib/StereoParameters.java): right_to_left pose
    stored as rotation+translation of the LEFT camera seen FROM the right
    (the reference stores rightToLeft; we store left-to-right R, t such
    that X_right = R @ X_left + t)."""
    left: CameraPinholeBrown
    right: CameraPinholeBrown
    R_l2r: Tuple[Tuple[float, ...], ...]
    t_l2r: Tuple[float, ...]

    def R(self, dtype=jnp.float64):
        return jnp.asarray(self.R_l2r, dtype=dtype)

    def t(self, dtype=jnp.float64):
        return jnp.asarray(self.t_l2r, dtype=dtype)

    @property
    def baseline(self) -> float:
        import math
        return math.sqrt(sum(v * v for v in self.t_l2r))
