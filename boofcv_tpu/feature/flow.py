"""Dense optical flow.

Reference analog: boofcv-feature alg/flow/ — HornSchunck.java /
HornSchunckPyramid.java (variational), DenseOpticalFlowBlockPyramid.java
(block matching), DenseOpticalFlowKlt.java (per-pixel KLT).

TPU design: Horn-Schunck's Jacobi relaxation is an elementwise stencil
iterated under lax.fori_loop — pure VPU; the pyramid wrapper upsamples
flow coarse-to-fine.  Block flow evaluates a (2r+1)^2 search
neighborhood as a stacked shift-and-SAD volume, argmin over the
displacement axis.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from boofcv_tpu.core.pyramid import PyramidConfig
from boofcv_tpu.ip import pyramid_ops
from boofcv_tpu.ip.interpolate import bilinear


def _gradients_hs(i1, i2):
    """Horn-Schunck derivative estimates (average of forward diffs in the
    two frames, HornSchunck.java's kernel)."""
    dx = 0.5 * (jnp.roll(i1, -1, 1) - jnp.roll(i1, 1, 1)
                + jnp.roll(i2, -1, 1) - jnp.roll(i2, 1, 1)) * 0.5
    dy = 0.5 * (jnp.roll(i1, -1, 0) - jnp.roll(i1, 1, 0)
                + jnp.roll(i2, -1, 0) - jnp.roll(i2, 1, 0)) * 0.5
    dt = i2 - i1
    return dx, dy, dt


def _laplacian_avg(f):
    """6/12-weighted neighborhood average used by Horn-Schunck."""
    up = jnp.roll(f, 1, 0)
    dn = jnp.roll(f, -1, 0)
    lf = jnp.roll(f, 1, 1)
    rt = jnp.roll(f, -1, 1)
    d1 = jnp.roll(up, 1, 1)
    d2 = jnp.roll(up, -1, 1)
    d3 = jnp.roll(dn, 1, 1)
    d4 = jnp.roll(dn, -1, 1)
    return (up + dn + lf + rt) / 6.0 + (d1 + d2 + d3 + d4) / 12.0


def horn_schunck(image1, image2, alpha: float = 20.0,
                 iterations: int = 200, init_flow=None):
    """Single-level Horn-Schunck (HornSchunck.java).  Returns (u, v)."""
    i1 = image1.astype(jnp.float32)
    i2 = image2.astype(jnp.float32)
    dx, dy, dt = _gradients_hs(i1, i2)
    a2 = jnp.float32(alpha * alpha)
    if init_flow is None:
        u0 = jnp.zeros_like(i1)
        v0 = jnp.zeros_like(i1)
    else:
        u0, v0 = init_flow

    def body(_, uv):
        u, v = uv
        ub = _laplacian_avg(u)
        vb = _laplacian_avg(v)
        num = dx * ub + dy * vb + dt
        den = a2 + dx * dx + dy * dy
        u = ub - dx * num / den
        v = vb - dy * num / den
        return u, v

    return lax.fori_loop(0, iterations, body, (u0, v0))


def _warp_image(image, u, v):
    h, w = image.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    return bilinear(image, ys + v, xs + u)


def horn_schunck_pyramid(image1, image2, alpha: float = 20.0,
                         iterations: int = 100,
                         scales=(1, 2, 4, 8)):
    """Coarse-to-fine Horn-Schunck with warping (HornSchunckPyramid.java).

    Returns (u, v) at full resolution.
    """
    cfg = PyramidConfig(scales=tuple(scales))
    p1 = pyramid_ops.pyramid_average(image1.astype(jnp.float32), cfg)
    p2 = pyramid_ops.pyramid_average(image2.astype(jnp.float32), cfg)
    u = jnp.zeros_like(p1[-1])
    v = jnp.zeros_like(p1[-1])
    for lvl in range(len(scales) - 1, -1, -1):
        i1 = p1[lvl]
        i2 = p2[lvl]
        if u.shape != i1.shape:
            ratio = scales[lvl + 1] / scales[lvl]
            h, w = i1.shape
            ys = jnp.arange(h, dtype=jnp.float32) / ratio
            xs = jnp.arange(w, dtype=jnp.float32) / ratio
            yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
            u = bilinear(u, yy, xx) * ratio
            v = bilinear(v, yy, xx) * ratio
        # warp second image by current flow, solve for residual flow
        i2w = _warp_image(i2, u, v)
        du, dv = horn_schunck(i1, i2w, alpha, iterations)
        u = u + du
        v = v + dv
    return u, v


def block_flow(image1, image2, search_radius: int = 4,
               region_radius: int = 3):
    """Dense block-matching flow (DenseOpticalFlowBlockPyramid): for each
    pixel the displacement in [-r, r]^2 minimizing SAD over a
    (2*region_radius+1)^2 window.  Returns (u, v, sad)."""
    i1 = image1.astype(jnp.float32)
    i2 = image2.astype(jnp.float32)
    h, w = i1.shape
    rr = region_radius
    sads = []
    disps = []
    for dy in range(-search_radius, search_radius + 1):
        for dx in range(-search_radius, search_radius + 1):
            shifted = jnp.roll(jnp.roll(i2, -dy, 0), -dx, 1)
            e = jnp.abs(i1 - shifted)
            # box sum
            c = jnp.cumsum(jnp.pad(e, ((rr, rr), (rr, rr))), axis=0)
            c = jnp.pad(c, ((1, 0), (0, 0)))
            e = c[2 * rr + 1:, :] - c[: -2 * rr - 1, :]
            c = jnp.cumsum(e, axis=1)
            c = jnp.pad(c, ((0, 0), (1, 0)))
            e = c[:, 2 * rr + 1:] - c[:, : -2 * rr - 1]
            sads.append(e)
            disps.append((dx, dy))
    vol = jnp.stack(sads, axis=0)
    best = jnp.argmin(vol, axis=0)
    dxs = jnp.asarray([d[0] for d in disps], jnp.float32)
    dys = jnp.asarray([d[1] for d in disps], jnp.float32)
    return dxs[best], dys[best], jnp.min(vol, axis=0)
