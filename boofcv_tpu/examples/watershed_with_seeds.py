"""Marker-controlled watershed segmentation.

Reference analog: examples/segmentation/ExampleWatershedWithSeeds.java —
user-provided seed markers flood the gradient "height map" so each pixel
joins a seed's basin.  Oracle: two rendered disks with distinct seeds
segment into two regions whose sizes match the disks.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.feature import segmentation
    from boofcv_tpu.ip import derivative

    rng = np.random.default_rng(2)
    img = np.full((120, 160), 30.0, np.float32)
    yy, xx = np.mgrid[0:120, 0:160]
    disk1 = (yy - 55) ** 2 + (xx - 50) ** 2 < 30 ** 2
    disk2 = (yy - 60) ** 2 + (xx - 112) ** 2 < 26 ** 2
    img[disk1] = 200.0
    img[disk2] = 150.0
    img += rng.normal(0, 2.0, img.shape)

    dx, dy = derivative.sobel(jnp.asarray(img))
    height = np.asarray(jnp.hypot(dx, dy))
    markers = np.zeros((120, 160), np.int32)
    markers[55, 50] = 1          # seed inside disk 1
    markers[60, 112] = 2         # seed inside disk 2
    markers[5, 5] = 3            # background seed
    labels = np.asarray(segmentation.watershed(jnp.asarray(height),
                                               jnp.asarray(markers)))
    a1 = (labels == 1).sum()
    a2 = (labels == 2).sum()
    iou1 = (disk1 & (labels == 1)).sum() / (disk1 | (labels == 1)).sum()
    iou2 = (disk2 & (labels == 2)).sum() / (disk2 | (labels == 2)).sum()
    print(f"region sizes: {a1}, {a2} px (true {disk1.sum()}, "
          f"{disk2.sum()}); IoU {iou1:.2f}, {iou2:.2f}")
    ok = iou1 > 0.85 and iou2 > 0.85 and (labels > 0).all()
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
