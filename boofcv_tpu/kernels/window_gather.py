"""Pallas TPU kernel: batched per-track window gather.

TPU XLA gathers are element-serialized: pulling N=512 small (16, 16)
neighborhoods out of a 480x640 image costs ~0.7 ms — it dominates every
per-feature stage (KLT, template sampling, descriptors).  This kernel
does the same job in ~0.05 ms by exploiting Mosaic's aligned vector
loads: the grid iterates over tracks, each program loads an
(8-row-aligned, 128-lane-aligned) [WY, 256] tile of the VMEM-resident
image, lane-rotates it by the sub-tile x offset (`pltpu.roll` lowers to
tpu.dynamic_rotate, the one lane-dynamic primitive Mosaic has), and
stores the leading [WY, WX] columns.

Alignment contract (why the arguments look odd): Mosaic must *prove*
dynamic slice offsets are tile-aligned, so callers pass `oy8 = oy // 8`
and the kernel multiplies by 8 (provably aligned by construction);
x is split as `ox = ox128 * 128 + shift` with shift in [0, 128).

Reference analog: none — BoofCV samples per-feature rectangles with
scalar loops (alg/interpolate/InterpolateRectangle usage in
alg/tracker/klt/KltTracker.java:147); this is the TPU-native form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_LANES = 128
_SUBLANES = 8


def _pad_image(image, wy: int, pad_left: int = 0, pad_bottom: int = 0):
    """Pad to the alignment the kernel's loads need: rows to a multiple
    of 8 covering oy+wy, columns to 128*k + 256-wide load headroom.
    Edge-padding preserves the border-clamp sampling semantics.
    pad_left/pad_bottom add extra edge-replicated border so callers can
    use window origins outside the image (offsets biased by pad_left)."""
    h, w = image.shape
    hp = max(-(-(h + pad_bottom) // _SUBLANES) * _SUBLANES, wy)
    wl = w + pad_left
    wp = ((max(wl - 1, 0)) // _LANES) * _LANES + 2 * _LANES
    return jnp.pad(image, ((0, hp - h), (pad_left, wp - wl)), mode="edge")


def _kernel(img_ref, oy8_ref, ox128_ref, sh_ref, out_ref, *, wy, wx):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    i = pl.program_id(0)
    oy = oy8_ref[0, i] * _SUBLANES
    oxt = ox128_ref[0, i] * _LANES
    block = img_ref[pl.ds(oy, wy), pl.ds(oxt, 2 * _LANES)]
    rolled = pltpu.roll(block, -sh_ref[0, i], 1)
    out_ref[0] = rolled[:, :wx]


@functools.partial(jax.jit, static_argnames=("wy", "wx", "pad_left",
                                             "pad_bottom", "force_xla"))
def gather_windows(image, oy, ox, wy: int = 24, wx: int = 16,
                   pad_left: int = 0, pad_bottom: int = 0,
                   force_xla: bool = False):
    """Gather [N, wy, wx] windows with integer top-left corners (oy, ox).

    oy must be a multiple of 8 (callers align it; the wy rows of slack
    exist precisely so an aligned origin can still cover the patch).
    ox is arbitrary and may be as low as -pad_left (reads resolve to
    edge-replicated border pixels); rows below h resolve likewise up to
    pad_bottom.  Otherwise offsets must satisfy oy <= ~h, ox <= w - wx.
    image: [h, w] float32.
    """
    n = oy.shape[0]
    img = image if image.dtype == jnp.float32 else image.astype(jnp.float32)
    oy = oy.astype(jnp.int32)
    ox = ox.astype(jnp.int32) + pad_left

    padded = _pad_image(img, wy, pad_left, pad_bottom)

    backend = jax.default_backend()
    if force_xla or backend not in ("tpu",):
        # CPU/GPU fallback: vmapped dynamic_slice on the same padded
        # image (XLA handles it fine off-TPU); bit-identical to the
        # kernel path so tests are backend-agnostic.
        return jax.vmap(
            lambda a, b: lax.dynamic_slice(padded, (a, b), (wy, wx)))(oy, ox)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    hp, wp = padded.shape
    kern = functools.partial(_kernel, wy=wy, wx=wx)
    scalar_spec = pl.BlockSpec((1, n), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            grid=(n,),
            in_specs=[
                pl.BlockSpec((hp, wp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                scalar_spec, scalar_spec, scalar_spec,
            ],
            out_specs=pl.BlockSpec((1, wy, wx), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, wy, wx), jnp.float32),
        )(padded, (oy // _SUBLANES)[None], (ox // _LANES)[None],
          (ox % _LANES)[None])
    return out


def select_rows(windows, offsets, rows: int):
    """Pick ``rows`` consecutive rows starting at per-window integer
    ``offsets`` out of [N, wy, wx] windows — as a one-hot batched matmul
    (TPU gathers are serialized; a [N, rows, wy] one-hot contraction is
    ~free on the MXU)."""
    n, wy, _ = windows.shape
    a = jnp.arange(wy, dtype=jnp.int32)[None, None, :]
    i = jnp.arange(rows, dtype=jnp.int32)[None, :, None]
    sel = (a == offsets[:, None, None] + i).astype(windows.dtype)
    return jnp.einsum("nra,naw->nrw", sel, windows)


def aligned_window_origin(cy, cx, radius: int, h: int, w: int,
                          wy: int = 24, wx: int = 16):
    """Choose window origins for float centers (cy, cx) such that the
    (2r+2)-span bilinear support sits inside with room to drift.

    Returns (oy, ox) int32 with oy 8-aligned, plus the float in-window
    patch top-left (py0, px0) = (cy - r - oy, cx - r - ox).
    """
    p1 = 2 * radius + 2                      # patch + bilinear extent
    sy = (wy - p1) // 2
    sx = (wx - p1) // 2
    oy_ideal = jnp.floor(cy).astype(jnp.int32) - radius - sy
    oy = jnp.clip((oy_ideal // _SUBLANES) * _SUBLANES, 0,
                  max(((h // _SUBLANES) * _SUBLANES) - wy, 0))
    ox = jnp.clip(jnp.floor(cx).astype(jnp.int32) - radius - sx,
                  0, max(w - wx, 0))
    py0 = cy - radius - oy.astype(cy.dtype)
    px0 = cx - radius - ox.astype(cx.dtype)
    return oy, ox, py0, px0
