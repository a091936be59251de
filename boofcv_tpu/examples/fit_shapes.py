"""Fit polygons and ellipses to binary blobs.

Reference analog: examples/features/ExampleFitPolygon.java +
ExampleFitEllipse.java — threshold, trace contours, fit shapes.
Oracle: a rendered rectangle comes back as a 4-gon with correct corners;
a rendered ellipse's center/axes are recovered.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.ip import binary, threshold
    from boofcv_tpu.feature import shapes

    img = np.full((140, 200), 230.0, np.float32)
    img[25:75, 30:110] = 25.0                      # rectangle
    yy, xx = np.mgrid[0:140, 0:200].astype(np.float64)
    ell = ((xx - 155) / 28.0) ** 2 + ((yy - 85) / 16.0) ** 2 <= 1.0
    img[ell] = 25.0
    img += np.random.default_rng(0).normal(0, 2.0, img.shape)

    bw = threshold.threshold(jnp.asarray(img), 128.0, down=True)
    contours = binary.contour_external(np.asarray(bw))
    polys, ells = [], []
    for c in contours:
        if len(c) < 30:
            continue
        p = shapes.fit_polygon(c, num_sides=4)
        e = shapes.fit_ellipse(c)
        ratio = None if e is None else e["b"] / max(e["a"], 1e-9)
        # rectangle fits a clean convex 4-gon; ellipse center test below
        polys.append(p)
        ells.append(e)
    print(f"blobs: {len(polys)}")

    rect_ok = ell_ok = False
    for p, e in zip(polys, ells):
        if p is not None and len(p) == 4:
            corners = np.asarray(p, float)
            target = np.array([[30, 25], [109, 25], [109, 74], [30, 74]],
                              float)
            d = np.linalg.norm(corners[:, None] - target[None], axis=-1)
            if d.min(axis=1).max() < 3.0:
                rect_ok = True
                print(f"rectangle 4-gon corners within "
                      f"{d.min(axis=1).max():.1f} px")
        if e is not None:
            cx, cy = e["center"]
            if abs(cx - 155) < 2 and abs(cy - 85) < 2 \
                    and abs(e["a"] - 28) < 3 and abs(e["b"] - 16) < 3:
                ell_ok = True
                print(f"ellipse center ({cx:.1f}, {cy:.1f}) axes "
                      f"({e['a']:.1f}, {e['b']:.1f})")
    ok = rect_ok and ell_ok
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
