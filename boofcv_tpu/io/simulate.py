"""Synthetic world rendering — the test oracle for VO / calibration.

Reference analog: boofcv-simulation SimulatePlanarWorld.java (renders
textured planes through arbitrary camera models) and the sfm test helper
VideoSequenceSimulator.java:46 (random scenes driving
CheckVisualOdometryStereoSim).

Rendering here is exact inverse mapping: each output pixel's ray is
intersected with a world plane and the texture is bilinearly sampled —
one fused jnp pipeline per frame, no rasterization."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from boofcv_tpu.ip.interpolate import bilinear


def checker_texture(rng, size: int = 512, square: int = 24,
                    noise: float = 12.0) -> np.ndarray:
    """High-contrast checkerboard + noise texture (corner-detector oracle).

    NOTE: periodic — do NOT use for stereo matching tests (block matchers
    alias onto neighboring periods); use :func:`noise_texture` there."""
    yy, xx = np.mgrid[0:size, 0:size]
    base = (((yy // square) + (xx // square)) % 2) * 180.0 + 40.0
    tex = base + rng.normal(0, noise, base.shape)
    # light smoothing for subpixel interpolation stability
    k = np.array([0.25, 0.5, 0.25])
    tex = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, tex)
    tex = np.apply_along_axis(lambda c: np.convolve(c, k, "same"), 0, tex)
    return tex.astype(np.float32)


def noise_texture(rng, size: int = 512, octaves: int = 4) -> np.ndarray:
    """Non-periodic multi-octave noise texture: corner-rich at several
    scales and alias-free for stereo block matching / KLT."""
    tex = np.zeros((size, size))
    for o in range(octaves):
        step = 2 ** o
        small = rng.uniform(0, 1, (size // step + 2, size // step + 2))
        # bilinear upsample
        yy, xx = np.mgrid[0:size, 0:size] / step
        y0 = yy.astype(int); x0 = xx.astype(int)
        fy = yy - y0; fx = xx - x0
        up = (small[y0, x0] * (1 - fy) * (1 - fx)
              + small[y0, x0 + 1] * (1 - fy) * fx
              + small[y0 + 1, x0] * fy * (1 - fx)
              + small[y0 + 1, x0 + 1] * fy * fx)
        tex += up * (2.0 ** o)
    tex = (tex - tex.min()) / (tex.max() - tex.min())
    return (tex * 235.0 + 10.0).astype(np.float32)


def render_plane(texture, K, R, t, height: int, width: int,
                 plane_origin=(0.0, 0.0, 6.0),
                 plane_x=(1.0, 0.0, 0.0), plane_y=(0.0, 1.0, -0.15),
                 texture_scale: float = 40.0, background: float = 0.0):
    """Render a textured world plane seen by camera (R, t) (world->cam).

    The plane is parameterized X(u, v) = origin + u * ex + v * ey; texture
    pixel (u, v) * texture_scale + center.  A slightly tilted ey (default)
    gives the scene depth variation so P3P/stereo geometry is
    well-conditioned.  Returns [H, W] f32 image.
    """
    K = jnp.asarray(K, jnp.float64)
    R = jnp.asarray(R, jnp.float64)
    t = jnp.asarray(t, jnp.float64)
    texture = jnp.asarray(texture)
    o = jnp.asarray(plane_origin, jnp.float64)
    ex = jnp.asarray(plane_x, jnp.float64)
    ey = jnp.asarray(plane_y, jnp.float64)
    n = jnp.cross(ex, ey)
    n = n / jnp.linalg.norm(n)

    ys, xs = jnp.meshgrid(jnp.arange(height, dtype=jnp.float64),
                          jnp.arange(width, dtype=jnp.float64), indexing="ij")
    from boofcv_tpu.geo.smalllinalg import inv3
    Kinv = inv3(K)
    rays_c = jnp.stack([xs, ys, jnp.ones_like(xs)], -1) @ Kinv.T  # cam dirs
    # world ray: origin c0 = -R^T t, dir = R^T ray
    Rt = R.T
    c0 = -(Rt @ t)
    d_w = rays_c @ R  # == rays_c @ (R^T)^T
    denom = d_w @ n
    s = ((o - c0) @ n) / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    X = c0 + s[..., None] * d_w
    rel = X - o
    # plane coordinates via least squares on the (ex, ey) basis
    g11 = ex @ ex
    g12 = ex @ ey
    g22 = ey @ ey
    b1 = rel @ ex
    b2 = rel @ ey
    det = g11 * g22 - g12 * g12
    u = (g22 * b1 - g12 * b2) / det
    v = (g11 * b2 - g12 * b1) / det
    th, tw = texture.shape
    tu = u * texture_scale + tw / 2.0
    tv = v * texture_scale + th / 2.0
    img = bilinear(texture.astype(jnp.float32), tv.astype(jnp.float32),
                   tu.astype(jnp.float32))
    visible = (s > 0) & (tu >= 0) & (tu < tw - 1) & (tv >= 0) & (tv < th - 1)
    return jnp.where(visible, img, background).astype(jnp.float32)


def render_stereo_sequence(rng, K, baseline: float, poses, height, width,
                           **plane_kw):
    """Render (left, right) images for each world->left pose in ``poses``.

    Right camera: x_r = x_l - (baseline, 0, 0) in the left frame (standard
    rectified stereo: right camera displaced +x in world-ish terms) —
    i.e. R_r = R_l, t_r = t_l - (b, 0, 0).
    """
    tex = noise_texture(rng)
    frames = []
    offset = jnp.asarray([baseline, 0.0, 0.0])
    for R, t in poses:
        left = render_plane(tex, K, R, t, height, width, **plane_kw)
        right = render_plane(tex, K, R, jnp.asarray(t) - offset, height,
                             width, **plane_kw)
        frames.append((left, right))
    return frames
