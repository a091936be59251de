"""Detect lines with the Hough transform.

Reference analog: examples/features/ExampleLineDetection.java — Hough
from the gradient image (polar parameterization) finding the dominant
straight edges of a rendered rectangle.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.feature import lines

    rng = np.random.default_rng(17)
    img = np.full((120, 160), 30.0, np.float32)
    img[30:90, 40:120] = 220.0                     # rectangle: 4 edges
    img += rng.normal(0, 3, img.shape)

    found = lines.hough_gradient(jnp.asarray(img), max_lines=6,
                                 edge_threshold=40.0)
    rho = np.asarray(found.rho)
    theta = np.asarray(found.theta)
    valid = np.asarray(found.valid)
    n = int(valid.sum())
    print(f"hough (gradient/polar): {n} lines")
    # expect two ~horizontal and two ~vertical lines
    th = np.mod(theta[valid], np.pi)
    horiz = np.sum((np.abs(th - np.pi / 2) < 0.15))
    vert = np.sum((th < 0.15) | (th > np.pi - 0.15))
    print(f"~horizontal: {horiz}, ~vertical: {vert}")
    ok = n >= 4 and horiz >= 2 and vert >= 2
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
