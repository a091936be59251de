"""Point-controlled image deformation (moving least squares).

Reference analog: examples/imageprocessing/ExamplePointDeformKeyPoints
.java — drag control points, warp the image with MLS (Schaefer 2006).
Oracle: fixed control points stay fixed; a dragged point carries its
image content with it.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.ip import mls, interpolate

    rng = np.random.default_rng(1)
    from scipy.ndimage import gaussian_filter
    img = gaussian_filter(rng.normal(0, 1, (120, 160)), 2.5)
    img = (120 + 70 * img / img.std()).astype(np.float32)

    # corners pinned, center dragged 18 px right / 10 px down
    src = np.array([[20, 20], [140, 20], [140, 100], [20, 100],
                    [80, 60]], np.float64)
    dst = src.copy()
    dst[4] = [98, 70]

    out = np.asarray(mls.deform(jnp.asarray(img), src, dst,
                                kind="similarity"))
    # pinned corners keep their local content
    errs_pin = [np.abs(out[y - 3:y + 4, x - 3:x + 4]
                       - img[y - 3:y + 4, x - 3:x + 4]).mean()
                for x, y in src[:4].astype(int)]
    # the dragged point's new location shows the source content
    val_dst = np.asarray(interpolate.bilinear(
        jnp.asarray(out), jnp.asarray([70.0]), jnp.asarray([98.0])))[0]
    val_src = img[60, 80]
    print(f"pinned-corner mean err {np.mean(errs_pin):.2f}; dragged "
          f"content |diff| {abs(val_dst - val_src):.1f} (image std "
          f"{img.std():.0f})")
    ok = np.mean(errs_pin) < 6.0 and abs(val_dst - val_src) < 15.0
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
