"""Pallas TPU kernel: one full KLT level (all GN iterations) per launch.

The XLA path of feature/klt runs max_iterations sequential stages, each a
block-gather + reductions over [N, P, P] — per-stage overhead dominates
at N=512, P=7.  This kernel keeps the level image resident in VMEM and
runs each track's full inverse-compositional Gauss-Newton iteration loop
on-chip: the grid iterates over tracks (hardware-sequenced — Mosaic
unrolls per-track fori_loops recursively in Python, so tracks must NOT be
an in-kernel loop), bilinear patch loads are dynamic VMEM slices.

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


def _klt_track_kernel(image_ref, desc_ref, gx_ref, gy_ref, cy_ref, cx_ref,
                      out_cy_ref, out_cx_ref, out_err_ref, out_det_ref,
                      *, radius: int, iterations: int, height: int,
                      width: int):
    p = 2 * radius + 1
    i = pl.program_id(0)                # this program's track
    d = desc_ref[0]                     # [P, P]
    gx = gx_ref[0]
    gy = gy_ref[0]
    gxx = jnp.sum(gx * gx)
    gxy = jnp.sum(gx * gy)
    gyy = jnp.sum(gy * gy)
    det = gxx * gyy - gxy * gxy
    safe_det = jnp.where(det == 0, 1.0, det)

    def sample(cy, cx):
        """Bilinear (P, P) patch from an ALIGNED VMEM block.

        Mosaic requires dynamic lane-dim (dim 1) slice offsets provably
        128-aligned (and sublane offsets 8-aligned) — the naive
        `image_ref[pl.ds(yi, p+1), pl.ds(xi, p+1)]` fails to lower at
        640x480.  Load a [16, 256] block at (yi//8*8, xi//128*128)
        (provably aligned; the min() clamps are against aligned
        constants) and extract the (P+1, P+1) window with two one-hot
        matmuls — tiny MXU work instead of unaligned vector loads.
        Requires height % 8 == 0, width % 128 == 0 (the caller gates).
        """
        y0 = jnp.floor(cy)
        x0 = jnp.floor(cx)
        fy = cy - y0
        fx = cx - x0
        yi = jnp.clip(y0.astype(jnp.int32) - radius, 0, height - p - 1)
        xi = jnp.clip(x0.astype(jnp.int32) - radius, 0, width - p - 1)
        # the image is edge-padded by the caller so an aligned [16, 256]
        # block starting at the tile floor of any valid (yi, xi) always
        # fits — the offsets are then PROVABLY 8/128-aligned with no
        # clamping (a min() against an unaligned bound reintroduces the
        # Mosaic lowering failure)
        bh, bw = 16, 256
        ya = (yi // 8) * 8
        xa = (xi // 128) * 128
        block = image_ref[pl.ds(ya, bh), pl.ds(xa, bw)]    # [BH, BW]
        oy = yi - ya                                       # in [0, 8)
        ox = xi - xa                                       # in [0, BW-128+128)
        row_pos = lax.broadcasted_iota(jnp.int32, (bh, p + 1), 0)
        row_tgt = lax.broadcasted_iota(jnp.int32, (bh, p + 1), 1) + oy
        row_oh = (row_pos == row_tgt).astype(jnp.float32)  # [BH, P1]
        col_pos = lax.broadcasted_iota(jnp.int32, (bw, p + 1), 0)
        col_tgt = lax.broadcasted_iota(jnp.int32, (bw, p + 1), 1) + ox
        col_oh = (col_pos == col_tgt).astype(jnp.float32)  # [BW, P1]
        sl = jnp.dot(jnp.dot(row_oh.T, block,
                             preferred_element_type=jnp.float32),
                     col_oh, preferred_element_type=jnp.float32)
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

    # NOTE: with jax_enable_x64 the default fori_loop induction variable
    # is int64, and any i64 value sends Mosaic's convert-element-type
    # lowering into infinite recursion — force i32 bounds.
    cy, cx = lax.fori_loop(jnp.int32(0), jnp.int32(iterations), gn_iter,
                           (cy_ref[0, i], cx_ref[0, i]))
    final = sample(cy, cx)
    out_cy_ref[0, i] = cy
    out_cx_ref[0, i] = cx
    out_err_ref[0, i] = jnp.mean(jnp.abs(final - d))
    out_det_ref[0, i] = det


def klt_level_pallas(image, desc, gx, gy, cy, cx, *, radius: int,
                     iterations: int, interpret: bool = False):
    """Run one KLT level for all N tracks.  Returns (cy, cx, per_pixel_err,
    det) — faulting logic stays in the caller (feature.klt)."""
    n = desc.shape[0]
    h, w = image.shape
    p = 2 * radius + 1

    # edge-pad so every aligned [16, 256] block load fits (see sample())
    hp = -(-h // 8) * 8 + 16
    wp = -(-w // 128) * 128 + 256
    image = jnp.pad(image.astype(jnp.float32),
                    ((0, hp - h), (0, wp - w)), mode="edge")

    kernel = functools.partial(
        _klt_track_kernel, radius=radius, iterations=iterations,
        height=h, width=w)
    # per-track scalars are carried as full (1, N) SMEM blocks (scalar
    # loads/stores are an SMEM feature; Pallas block shapes must tile by
    # (8, 128) or equal the array dims); each program addresses its own
    # column via program_id
    scalar_spec = pl.BlockSpec((1, n), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)
    patch_spec = pl.BlockSpec((1, p, p), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    # The global jax_enable_x64 flag (geometry policy) must not leak into
    # the kernel trace: any 64-bit value sends Mosaic's convert-element-
    # type lowering into infinite recursion (i64->i32 re-dispatches itself).
    x64_off = jax.enable_x64(False)
    x64_off.__enter__()
    out_cy, out_cx, out_err, out_det = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((hp, wp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            patch_spec, patch_spec, patch_spec,
            scalar_spec, scalar_spec,
        ],
        out_specs=[scalar_spec, scalar_spec, scalar_spec, scalar_spec],
        out_shape=[
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
        interpret=interpret,
    )(image.astype(jnp.float32), desc, gx, gy,
      cy.astype(jnp.float32)[None, :], cx.astype(jnp.float32)[None, :])
    x64_off.__exit__(None, None, None)
    return (out_cy[0], out_cx[0], out_err[0], out_det[0])
