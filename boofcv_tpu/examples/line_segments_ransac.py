"""Detect line SEGMENTS with the grid-RANSAC detector.

Reference analog: examples/features/ExampleLineRansac.java
(GridRansacLineDetector) — gradient pixels are grouped per grid region,
lines RANSAC-fit per region, then connected.  Oracle: a rendered
triangle's three edges come back with correct angles.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.feature import lines

    rng = np.random.default_rng(3)
    img = np.full((160, 200), 40.0, np.float32)
    yy, xx = np.mgrid[0:160, 0:200]
    # filled triangle: edges at 0 deg (bottom), ~63 deg, ~-63 deg
    inside = (yy < 130) & (yy > 130 - 2 * (xx - 40)) \
        & (yy > 130 - 2 * (160 - xx))
    img[inside] = 210.0
    img += rng.normal(0, 2.5, img.shape)

    segs = lines.grid_ransac_lines(jnp.asarray(img), region_size=32,
                                   edge_threshold=30.0)
    valid = np.asarray(segs.valid)
    x0 = np.asarray(segs.x0)[valid]
    y0 = np.asarray(segs.y0)[valid]
    x1 = np.asarray(segs.x1)[valid]
    y1 = np.asarray(segs.y1)[valid]
    length = np.hypot(x1 - x0, y1 - y0)
    keep = length > 12
    angles = np.degrees(np.arctan2(y1 - y0, x1 - x0))[keep] % 180.0
    print(f"segments: {len(angles)}")

    def count_near(target, tol=8.0):
        d = np.minimum(np.abs(angles - target),
                       180 - np.abs(angles - target))
        return int((d < tol).sum())

    n_flat = count_near(0.0)
    n_up = count_near(63.4)
    n_dn = count_near(180 - 63.4)
    print(f"angle groups: horizontal {n_flat}, +63deg {n_up}, "
          f"-63deg {n_dn}")
    ok = n_flat >= 1 and n_up >= 1 and n_dn >= 1
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
