"""Pyramid construction (reference analog: boofcv-ip alg/transform/pyramid/*).

PyramidDiscreteSampleBlur (blur then subsample — the KLT default),
PyramidDiscreteAverage (2x2 mean), and per-level gradients (PyramidOps
.gradient).  A pyramid is a tuple of arrays; construction is a chain of
blur+stride convs that XLA fuses per level.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp

from boofcv_tpu.core.border import BorderType
from boofcv_tpu.core.kernel import gaussian_kernel
from boofcv_tpu.core.pyramid import PyramidConfig
from boofcv_tpu.ip import convolve, derivative


def pyramid_discrete(image: jnp.ndarray, config: PyramidConfig) -> Tuple[jnp.ndarray, ...]:
    """Blur-and-decimate pyramid (PyramidDiscreteSampleBlur semantics):
    each level blurred with sigma (default for radius 2 per octave step)
    then every-other-pixel sampled for each factor-of-2 step."""
    sigma = config.sigma if config.sigma > 0 else 1.0
    k = gaussian_kernel(sigma=sigma, dtype=jnp.float32)
    levels = [image.astype(jnp.float32)]
    cur = levels[0]
    for prev_s, s in zip(config.scales, config.scales[1:]):
        step = s // prev_s
        if step & (step - 1) or s % prev_s:
            raise ValueError(
                f"pyramid scales must step by powers of 2, got {prev_s}"
                f" -> {s} (a silent wrong-scale level otherwise)")
        while step > 1:
            blurred = convolve.separable(cur, k, k, BorderType.NORMALIZED)
            h, w = blurred.shape
            # crop odd dims first so level sizes match pyramid_shapes'
            # floor division ([::2] alone kept ceil(n/2) samples)
            cur = blurred[: h - h % 2: 2, : w - w % 2: 2]
            step //= 2
        levels.append(cur)
    return tuple(levels)


def pyramid_average(image: jnp.ndarray, config: PyramidConfig) -> Tuple[jnp.ndarray, ...]:
    """2x2 block-average pyramid (PyramidDiscreteAverage)."""
    levels = [image.astype(jnp.float32)]
    cur = levels[0]
    for prev_s, s in zip(config.scales, config.scales[1:]):
        step = s // prev_s
        if step & (step - 1) or s % prev_s:
            raise ValueError(
                f"pyramid scales must step by powers of 2, got {prev_s}"
                f" -> {s} (a silent wrong-scale level otherwise)")
        while step > 1:
            h, w = cur.shape
            cur = cur[: h - h % 2, : w - w % 2].reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            step //= 2
        levels.append(cur)
    return tuple(levels)


def gradient(pyramid: Sequence[jnp.ndarray], method: str = "sobel"):
    """Per-level gradient (PyramidOps.gradient).  Returns (dxs, dys) tuples."""
    fn = {"sobel": derivative.sobel, "three": derivative.three,
          "prewitt": derivative.prewitt}[method]
    grads = [fn(level) for level in pyramid]
    dxs = tuple(g[0] for g in grads)
    dys = tuple(g[1] for g in grads)
    return dxs, dys


def gaussian_scale_space(image: jnp.ndarray, sigmas: Sequence[float]):
    """Float-scale Gaussian scale space (PyramidFloatGaussianScale analog,
    all levels at full resolution — used by SIFT-style DoG)."""
    from boofcv_tpu.ip import blur as _blur
    levels = []
    for s in sigmas:
        levels.append(_blur.gaussian(image.astype(jnp.float32), sigma=s))
    return tuple(levels)
