"""Pallas TPU kernel: one full KLT level (all GN iterations) per launch.

The XLA path of feature/klt runs max_iterations sequential stages, each a
block-gather + reductions over [N, P, P] — per-stage overhead dominates
at N=512, P=7.  This kernel keeps the level image resident in VMEM and
iterates per-track Gauss-Newton entirely on-chip: grid over track blocks,
inner fori over (track-in-block, iteration), bilinear patch loads as
dynamic VMEM slices.

Semantics match feature.klt._track_level (inverse-compositional,
template-gradient Hessian, border-clamped sampling); equivalence is
tested against the XLA implementation in interpret mode on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


TRACK_BLOCK = 128   # tracks per grid program


def _klt_level_kernel(image_ref, desc_ref, gx_ref, gy_ref, cy_ref, cx_ref,
                      out_cy_ref, out_cx_ref, out_err_ref, out_det_ref,
                      *, radius: int, iterations: int, height: int,
                      width: int):
    # per-track scalars live in [TRACK_BLOCK, 1] refs (TPU wants >=2D)
    p = 2 * radius + 1
    nb = desc_ref.shape[0]

    def track_body(i, _):
        d = desc_ref[i]                     # [P, P]
        gx = gx_ref[i]
        gy = gy_ref[i]
        gxx = jnp.sum(gx * gx)
        gxy = jnp.sum(gx * gy)
        gyy = jnp.sum(gy * gy)
        det = gxx * gyy - gxy * gxy
        safe_det = jnp.where(det == 0, 1.0, det)

        def sample(cy, cx):
            """Bilinear (P, P) patch via one (P+1, P+1) VMEM slice."""
            y0 = jnp.floor(cy)
            x0 = jnp.floor(cx)
            fy = cy - y0
            fx = cx - x0
            yi = jnp.clip(y0.astype(jnp.int32) - radius, 0,
                          height - p - 1)
            xi = jnp.clip(x0.astype(jnp.int32) - radius, 0,
                          width - p - 1)
            sl = image_ref[pl.ds(yi, p + 1), pl.ds(xi, p + 1)]
            return ((1 - fy) * (1 - fx) * sl[:p, :p]
                    + (1 - fy) * fx * sl[:p, 1:]
                    + fy * (1 - fx) * sl[1:, :p]
                    + fy * fx * sl[1:, 1:])

        def gn_iter(_, state):
            cy, cx = state
            cur = sample(cy, cx)
            err = cur - d
            bx = jnp.sum(err * gx)
            by = jnp.sum(err * gy)
            dx = (gyy * bx - gxy * by) / safe_det
            dy = (gxx * by - gxy * bx) / safe_det
            return cy - dy, cx - dx

        cy0 = cy_ref[i, 0]
        cx0 = cx_ref[i, 0]
        cy, cx = lax.fori_loop(0, iterations, gn_iter, (cy0, cx0))
        final = sample(cy, cx)
        per_pixel = jnp.mean(jnp.abs(final - d))
        out_cy_ref[i, 0] = cy
        out_cx_ref[i, 0] = cx
        out_err_ref[i, 0] = per_pixel
        out_det_ref[i, 0] = det
        return 0

    lax.fori_loop(0, nb, track_body, 0)


def klt_level_pallas(image, desc, gx, gy, cy, cx, *, radius: int,
                     iterations: int, interpret: bool = False):
    """Run one KLT level for all N tracks.  Returns (cy, cx, per_pixel_err,
    det) — faulting logic stays in the caller (feature.klt)."""
    n = desc.shape[0]
    h, w = image.shape
    pad = (-n) % TRACK_BLOCK
    if pad:
        zf = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
        desc, gx, gy, cy, cx = map(zf, (desc, gx, gy, cy, cx))
    nt = desc.shape[0]
    grid = (nt // TRACK_BLOCK,)
    p = 2 * radius + 1

    kernel = functools.partial(
        _klt_level_kernel, radius=radius, iterations=iterations,
        height=h, width=w)
    out_cy, out_cx, out_err, out_det = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((h, w), lambda i: (0, 0),
                         memory_space=pltpu.ANY if False else pltpu.VMEM),
            pl.BlockSpec((TRACK_BLOCK, p, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TRACK_BLOCK, p, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TRACK_BLOCK, p, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TRACK_BLOCK, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TRACK_BLOCK, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TRACK_BLOCK, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TRACK_BLOCK, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TRACK_BLOCK, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TRACK_BLOCK, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nt, 1), jnp.float32),
            jax.ShapeDtypeStruct((nt, 1), jnp.float32),
            jax.ShapeDtypeStruct((nt, 1), jnp.float32),
            jax.ShapeDtypeStruct((nt, 1), jnp.float32),
        ],
        interpret=interpret,
    )(image.astype(jnp.float32), desc, gx, gy,
      cy.astype(jnp.float32)[:, None], cx.astype(jnp.float32)[:, None])
    return (out_cy[:n, 0], out_cx[:n, 0], out_err[:n, 0], out_det[:n, 0])
