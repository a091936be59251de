"""Graph-based image segmentation (Felzenszwalb-Huttenlocher 2004).

Reference analog: examples/segmentation/ExampleSegmentImage.java with
SegmentFelzenszwalbHuttenlocher04 — edge weights on device, sorted-edge
union-find merge in the native finisher.  Oracle: three flat regions
with noise segment into three dominant components aligned with ground
truth.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.feature import segmentation

    rng = np.random.default_rng(1)
    img = np.zeros((90, 120), np.float32)
    img[:, :40] = 60.0
    img[:, 40:80] = 140.0
    img[:, 80:] = 220.0
    img += rng.normal(0, 4.0, img.shape)

    labels, n = segmentation.segment_fh04(jnp.asarray(img), k=200.0,
                                          min_size=50)
    labels = np.asarray(labels)
    sizes = np.bincount(labels.ravel())
    big = np.argsort(sizes)[::-1][:3]
    purity = []
    for b, sl in zip(big, (np.s_[:, :40], np.s_[:, 40:80], np.s_[:, 80:])):
        # each big segment should live inside exactly one band
        band_of = [np.isin(labels[s], [b]).mean()
                   for s in (np.s_[:, :40], np.s_[:, 40:80], np.s_[:, 80:])]
        purity.append(max(band_of))
    print(f"segments: {n} (3 dominant cover "
          f"{sizes[big].sum() / labels.size:.0%}); band purity "
          f"{[round(p, 2) for p in purity]}")
    ok = sizes[big].sum() > 0.95 * labels.size \
        and all(p > 0.9 for p in purity)
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
