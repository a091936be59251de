"""Superpixel segmentation (SLIC) and graph-based segmentation (FH04).

Reference analog: examples/segmentation/ExampleSegmentSuperpixels.java —
segment an image into coherent regions.  A synthetic image of flat
colored regions is segmented; region purity is checked (each superpixel
should cover mostly one ground-truth region).
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.feature import segmentation

    rng = np.random.default_rng(12)
    h, w = 96, 128
    img = np.zeros((h, w), np.float32)
    gt = np.zeros((h, w), np.int32)
    img[:, :64] = 60.0
    img[:48, 64:] = 140.0
    gt[:48, 64:] = 1
    img[48:, 64:] = 220.0
    gt[48:, 64:] = 2
    img += rng.normal(0, 3, img.shape)

    labels = np.asarray(segmentation.slic(jnp.asarray(img), num_segments=64,
                                          iterations=8))
    n_sp = len(np.unique(labels))
    # purity: fraction of pixels whose superpixel's majority GT region
    # matches their own
    purity = 0
    for s in np.unique(labels):
        m = labels == s
        vals, counts = np.unique(gt[m], return_counts=True)
        purity += counts.max()
    purity /= labels.size
    print(f"SLIC: {n_sp} superpixels, region purity {purity:.3f}")

    fl, n_fh = segmentation.segment_fh04(jnp.asarray(img), k=100.0,
                                         min_size=40)
    fl = np.asarray(fl)
    n_regions = len(np.unique(fl))
    agree = 0
    for s in np.unique(fl):
        m = fl == s
        vals, counts = np.unique(gt[m], return_counts=True)
        agree += counts.max()
    agree /= fl.size
    print(f"FH04: {n_regions} regions, region purity {agree:.3f}")
    ok = purity > 0.97
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
