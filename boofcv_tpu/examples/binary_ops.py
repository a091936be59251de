"""Binary image operations: threshold, morphology, labeling, contours.

Reference analog: examples/imageprocessing/ExampleBinaryOps.java —
threshold -> erode/dilate -> connected components -> contours.  Oracle:
three noisy blobs survive cleanup as exactly three labeled components
with closed external contours.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.ip import binary, threshold

    rng = np.random.default_rng(7)
    img = np.full((120, 160), 220.0, np.float32)
    yy, xx = np.mgrid[0:120, 0:160]
    for cy, cx, r in ((35, 40, 16), (35, 115, 12), (85, 75, 20)):
        img[(yy - cy) ** 2 + (xx - cx) ** 2 < r * r] = 30.0
    img += rng.normal(0, 12, img.shape)               # salt noise

    t = float(threshold.compute_otsu(jnp.asarray(img), 0.0, 255.0))
    bw = threshold.threshold(jnp.asarray(img), t, down=True)
    n_raw = binary.label_blobs_host(np.asarray(bw))[1]
    clean = binary.dilate4(binary.erode4(binary.erode4(
        binary.dilate4(bw))))                          # close then open
    labels, n = binary.label_blobs_host(np.asarray(clean))
    contours = binary.contour_external(np.asarray(clean))
    big = [c for c in contours if len(c) > 20]
    print(f"otsu threshold {t:.0f}; components raw {n_raw} -> "
          f"cleaned {n}; contours {len(big)} (expected 3)")
    perims = sorted(len(c) for c in big)
    ok = n == 3 and len(big) == 3 and perims[0] > 40
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
