"""Basic gray-level intensity maps.

Reference analog: boofcv-ip alg/filter/basic/GrayImageOps.java —
brighten, stretch, invert (with clamping to the image's value range).
"""

from __future__ import annotations

import jax.numpy as jnp


def brighten(image, beta: float, max_value: float = 255.0):
    """I + beta, clamped (GrayImageOps.brighten)."""
    return jnp.clip(jnp.asarray(image, jnp.float32) + beta, 0.0, max_value)


def stretch(image, gamma: float, beta: float, max_value: float = 255.0):
    """gamma*I + beta, clamped (GrayImageOps.stretch)."""
    return jnp.clip(jnp.asarray(image, jnp.float32) * gamma + beta,
                    0.0, max_value)


def invert(image, max_value: float = 255.0):
    """max - I (GrayImageOps.invert)."""
    return max_value - jnp.asarray(image, jnp.float32)
