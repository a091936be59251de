"""Background models (stationary camera).

Reference analog: boofcv-feature alg/background/ —
BackgroundStationaryBasic (running average + threshold),
BackgroundStationaryGaussian (per-pixel mean/variance),
BackgroundStationaryGmm (mixture of Gaussians, stationary/moving).

TPU design: all three are pure elementwise state updates over [H, W(, C)]
arrays — one fused kernel per frame.  The moving-camera variants of the
reference compose these with a homography warp of the model
(ip.distort.warp) before the update.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Basic: exponential running average
# ---------------------------------------------------------------------------

def basic_init(image):
    return image.astype(jnp.float32)


def basic_update(model, image, learn_rate: float = 0.05):
    return model + learn_rate * (image.astype(jnp.float32) - model)


def basic_segment(model, image, threshold: float = 25.0):
    """1 = moving foreground (BackgroundStationaryBasic.segment)."""
    return (jnp.abs(image.astype(jnp.float32) - model) > threshold).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Gaussian: per-pixel mean + variance
# ---------------------------------------------------------------------------

class GaussianModel(NamedTuple):
    mean: jnp.ndarray
    var: jnp.ndarray


def gaussian_init(image, initial_var: float = 100.0):
    img = image.astype(jnp.float32)
    return GaussianModel(img, jnp.full_like(img, initial_var))


def gaussian_update(model: GaussianModel, image, learn_rate: float = 0.05,
                    min_var: float = 4.0):
    img = image.astype(jnp.float32)
    d = img - model.mean
    mean = model.mean + learn_rate * d
    var = model.var + learn_rate * (d * d - model.var)
    return GaussianModel(mean, jnp.maximum(var, min_var))


def gaussian_segment(model: GaussianModel, image,
                     threshold_sigma: float = 3.0):
    img = image.astype(jnp.float32)
    d2 = (img - model.mean) ** 2
    return (d2 > threshold_sigma ** 2 * model.var).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# GMM: K Gaussians per pixel (Stauffer-Grimson style, as in
# BackgroundStationaryGmm / GmmModelManager)
# ---------------------------------------------------------------------------

class GmmModel(NamedTuple):
    means: jnp.ndarray    # [K, H, W]
    vars: jnp.ndarray     # [K, H, W]
    weights: jnp.ndarray  # [K, H, W]


def gmm_init(image, k: int = 3, initial_var: float = 400.0):
    img = image.astype(jnp.float32)
    means = jnp.stack([img] + [jnp.zeros_like(img)] * (k - 1))
    vars_ = jnp.full_like(means, initial_var)
    weights = jnp.stack([jnp.ones_like(img)] +
                        [jnp.zeros_like(img)] * (k - 1))
    return GmmModel(means, vars_, weights)


def gmm_update(model: GmmModel, image, learn_rate: float = 0.02,
               match_sigma: float = 3.0, initial_var: float = 400.0,
               min_var: float = 4.0):
    """One Stauffer-Grimson update step, fully vectorized over pixels."""
    img = image.astype(jnp.float32)[None]
    d2 = (img - model.means) ** 2
    match = (d2 < match_sigma ** 2 * model.vars) & (model.weights > 0)
    # only the best (highest-weight) matching component updates
    score = jnp.where(match, model.weights, -1.0)
    best = jnp.argmax(score, axis=0)[None]                    # [1, H, W]
    k_idx = jnp.arange(model.means.shape[0])[:, None, None]
    is_best = (k_idx == best) & match
    any_match = jnp.any(match, axis=0, keepdims=True)

    rho = learn_rate
    means = jnp.where(is_best, model.means + rho * (img - model.means),
                      model.means)
    vars_ = jnp.where(is_best,
                      jnp.maximum(model.vars + rho * (d2 - model.vars),
                                  min_var),
                      model.vars)
    weights = model.weights + learn_rate * (is_best.astype(jnp.float32)
                                            - model.weights)

    # no match: replace weakest component with a fresh Gaussian
    weakest = jnp.argmin(jnp.where(model.weights > 0, model.weights,
                                   jnp.inf), axis=0)[None]
    is_weakest = (k_idx == weakest) & ~any_match
    means = jnp.where(is_weakest, img, means)
    vars_ = jnp.where(is_weakest, initial_var, vars_)
    weights = jnp.where(is_weakest, learn_rate, weights)

    wsum = jnp.sum(weights, axis=0, keepdims=True)
    weights = weights / jnp.maximum(wsum, 1e-12)
    return GmmModel(means, vars_, weights)


def gmm_segment(model: GmmModel, image, match_sigma: float = 3.0,
                bg_weight: float = 0.3):
    """Foreground = matches no component whose weight >= bg_weight."""
    img = image.astype(jnp.float32)[None]
    d2 = (img - model.means) ** 2
    match_bg = (d2 < match_sigma ** 2 * model.vars) & (model.weights >= bg_weight)
    return (~jnp.any(match_bg, axis=0)).astype(jnp.uint8)
