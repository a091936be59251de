"""Canny edge detection family.

Reference analog: boofcv-feature alg/feature/detect/edge/CannyEdge.java:45
(blur -> gradient -> direction-discretized non-max -> hysteresis threshold),
GradientToEdgeFeatures.java (intensity/direction ops),
HysteresisEdgeTraceMark.java:37 / HysteresisEdgeTracePoints.java (tracing).

TPU shape: the whole detector is ONE jitted program — Gaussian blur and
Sobel are fused stencils, the direction-discretized non-max is a gather-free
4-way select over shifted images, and hysteresis (a sequential flood fill in
the reference) becomes iterative mask propagation under ``lax.while_loop``
(the same fixpoint trick as ``ip.binary.label_blobs``): strong seeds dilate
through the weak mask until convergence, 8 sweeps per trip to amortize the
loop condition.  Edge-chain extraction (the reference's
HysteresisEdgeTracePoints output) is a host-side finisher on the final mask.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from boofcv_tpu.ip import blur as ip_blur
from boofcv_tpu.ip import derivative


def discretize_direction4(dx: jnp.ndarray, dy: jnp.ndarray) -> jnp.ndarray:
    """GradientToEdgeFeatures.discretizeDirection4: gradient angle folded
    to [0, pi) and binned into 4 sectors: 0 = horizontal gradient (edge
    runs vertically; compare E/W neighbors), 1 = 45deg, 2 = vertical,
    3 = 135deg."""
    theta = jnp.arctan2(dy, dx)
    theta = jnp.where(theta < 0, theta + jnp.pi, theta)          # [0, pi)
    sector = jnp.floor((theta + jnp.pi / 8) / (jnp.pi / 4)).astype(jnp.int32)
    return sector % 4


def _shift(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """img sampled at (y+dy, x+dx) with zero padding (off-image neighbors
    never suppress: they read as 0 intensity)."""
    h, w = img.shape
    p = jnp.pad(img, 1)
    return p[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]


def nonmax_direction4(intensity: jnp.ndarray,
                      direction: jnp.ndarray) -> jnp.ndarray:
    """Non-maximum suppression along the discretized gradient direction
    (ImplEdgeNonMaxSuppression analog): a pixel survives iff its intensity
    is strictly > the negative-direction neighbor and >= the positive one
    — the strict side breaks the exact tie a symmetric blurred step
    produces (two equal maxima straddling the edge), keeping edges one
    pixel thin."""
    # neighbors lie ALONG the gradient vector: sector 1 is a gradient at
    # ~45deg = (+x, +y) -> compare the NW/SE diagonal; sector 3 (135deg,
    # gradient (-x, +y)) -> NE/SW.  (These two were swapped originally,
    # which compared along the iso-contour and suppressed diagonal edges.)
    pairs = [((0, -1), (0, 1)),    # sector 0: horizontal gradient
             ((-1, -1), (1, 1)),   # sector 1: 45deg
             ((-1, 0), (1, 0)),    # sector 2: vertical
             ((-1, 1), (1, -1))]   # sector 3: 135deg
    keep = jnp.zeros(intensity.shape, bool)
    for s, (a, b) in enumerate(pairs):
        na = _shift(intensity, *a)
        nb = _shift(intensity, *b)
        ok = (intensity > na) & (intensity >= nb)
        keep = jnp.where(direction == s, ok, keep)
    return jnp.where(keep, intensity, 0.0)


def _dilate8_masked(strong: jnp.ndarray, weak: jnp.ndarray) -> jnp.ndarray:
    h, w = strong.shape
    p = jnp.pad(strong, 1)
    grown = jnp.zeros_like(strong)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            grown = grown | p[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]
    return grown & weak


def hysteresis(nms: jnp.ndarray, low: float, high: float) -> jnp.ndarray:
    """Double threshold + connectivity: pixels >= high seed; pixels >=
    low are kept iff 8-connected (through other weak pixels) to a seed.
    Sequential flood fill in the reference (HysteresisEdgeTraceMark);
    here a parallel fixpoint of masked dilation."""
    weak = nms >= low
    strong = nms >= high

    def cond(state):
        cur, prev = state
        return jnp.any(cur != prev)

    def body(state):
        cur, _ = state
        nxt = cur
        for _ in range(8):      # amortize the while condition
            nxt = _dilate8_masked(nxt, weak)
        return nxt, cur

    strong, _ = lax.while_loop(
        cond, body, (_dilate8_masked(strong, weak) | strong, strong))
    return strong.astype(jnp.uint8)


def canny(image, low: float, high: float, sigma: float = -1.0,
          radius: int = 2, relative: bool = False) -> jnp.ndarray:
    """CannyEdge.process: returns the binary edge mask [H, W] uint8.

    ``relative=True`` interprets low/high as fractions of the max edge
    intensity (CannyEdge's dynamic-threshold mode).  Intensity is the
    Euclidean gradient norm (GradientToEdgeFeatures.intensityE).
    """
    img = jnp.asarray(image, jnp.float32)
    blurred = ip_blur.gaussian(img, sigma=sigma, radius=radius)
    dx, dy = derivative.sobel(blurred)
    intensity = jnp.hypot(dx, dy)
    direction = discretize_direction4(dx, dy)
    nms = nonmax_direction4(intensity, direction)
    if relative:
        # a featureless frame's max(nms) is float-noise-level (exactly 0
        # or ~eps from the blur); an absolute floor scaled to the image
        # range keeps the thresholds above fp noise so the mask comes
        # back empty instead of all-noise
        floor = 1e-4 * (1.0 + jnp.max(jnp.abs(img)))
        m = jnp.max(nms)
        lo = jnp.maximum(low * m, floor)
        hi = jnp.maximum(high * m, floor)
        return hysteresis(nms, lo, hi)
    return hysteresis(nms, low, high)


def edge_contours(mask) -> list[np.ndarray]:
    """HysteresisEdgeTracePoints analog: group the edge mask into
    8-connected chains and order each chain by walking from an endpoint.
    Host-side finisher (tiny data: edge pixels only).  Returns a list of
    [K, 2] (x, y) int32 arrays."""
    m = np.asarray(mask) > 0
    h, w = m.shape
    ys, xs = np.nonzero(m)
    visited = np.zeros_like(m)
    nbrs = [(-1, -1), (-1, 0), (-1, 1), (0, -1),
            (0, 1), (1, -1), (1, 0), (1, 1)]

    def neighbors(y, x):
        for dy, dxx in nbrs:
            ny, nx = y + dy, x + dxx
            if 0 <= ny < h and 0 <= nx < w and m[ny, nx]:
                yield ny, nx

    def degree(y, x):
        return sum(1 for _ in neighbors(y, x))

    chains = []
    # endpoints first so open curves are walked end-to-end, then loops
    order = sorted(zip(ys.tolist(), xs.tolist()),
                   key=lambda p: (degree(*p) != 1,))
    for y0, x0 in order:
        if visited[y0, x0]:
            continue
        chain = [(x0, y0)]
        visited[y0, x0] = True
        cy, cx = y0, x0
        while True:
            nxt = [(ny, nx) for ny, nx in neighbors(cy, cx)
                   if not visited[ny, nx]]
            if not nxt:
                break
            # prefer 4-connected continuation (tighter chain ordering)
            nxt.sort(key=lambda p: abs(p[0] - cy) + abs(p[1] - cx))
            cy, cx = nxt[0]
            visited[cy, cx] = True
            chain.append((cx, cy))
        chains.append(np.array(chain, dtype=np.int32))
    return chains


def canny_contours(image, low: float, high: float, sigma: float = -1.0,
                   radius: int = 2, relative: bool = False
                   ) -> list[np.ndarray]:
    """CannyEdge with point-chain output (HysteresisEdgeTracePoints)."""
    return edge_contours(canny(image, low, high, sigma=sigma, radius=radius,
                               relative=relative))
