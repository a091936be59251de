"""Detect SURF features in two views and associate them.

Reference analog: examples/features/ExampleAssociatePoints.java (SURF
detect/describe both images -> greedy association) +
ExampleFeatureSurf.java.  The second view is the first shifted by a
known offset, so every surviving match can be checked against ground
truth.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.feature import associate, describe, fasthessian
    from boofcv_tpu.io import simulate
    from boofcv_tpu.ip import integral

    rng = np.random.default_rng(1)
    tex = simulate.noise_texture(rng, size=300, octaves=5)
    dy, dx = 7, 12
    img1 = tex[:240, :240].astype(np.float32) * 255
    img2 = tex[dy:240 + dy, dx:240 + dx].astype(np.float32) * 255

    def detect_describe(img):
        ii = integral.transform(jnp.asarray(img))
        det = fasthessian.detect(ii, max_features=150, threshold=1e3)
        angles = describe.orientation_average_haar(
            ii, det.ys, det.xs, det.scales)
        desc = describe.surf(ii, det.ys, det.xs, det.scales, angles)
        return det, desc

    d1, f1 = detect_describe(img1)
    d2, f2 = detect_describe(img2)
    scores = associate.score_euclidean_sq(f1, f2)
    m = associate.associate_mutual(scores, max_error=0.2)
    idx_a = np.asarray(m.src)
    idx_b = np.asarray(m.dst)
    valid = np.asarray(m.valid) & np.asarray(d1.valid)[idx_a] \
        & np.asarray(d2.valid)[idx_b]

    y1 = np.asarray(d1.ys)[idx_a][valid]
    x1 = np.asarray(d1.xs)[idx_a][valid]
    y2 = np.asarray(d2.ys)[idx_b][valid]
    x2 = np.asarray(d2.xs)[idx_b][valid]
    # ground truth: features move by (-dy, -dx) in image2 coordinates
    good = (np.abs((y2 - y1) + dy) < 2.0) & (np.abs((x2 - x1) + dx) < 2.0)
    n = int(valid.sum())
    print(f"detected {int(np.asarray(d1.valid).sum())} /"
          f" {int(np.asarray(d2.valid).sum())} SURF features")
    print(f"matches: {n}, consistent with the known shift: {int(good.sum())}")
    ok = n >= 20 and good.mean() > 0.8
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
