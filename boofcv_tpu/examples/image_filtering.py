"""Image filtering basics: blur, derivatives, binary ops, thresholding.

Reference analogs: examples/imageprocessing/ExampleImageFilter.java,
ExampleImageBlur.java, ExampleImageDerivative.java,
ExampleBinaryOps.java and examples/segmentation/ExampleThresholding.java
— one tour of the boofcv-ip layer with checkable invariants.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.ip import binary, blur, derivative, threshold

    rng = np.random.default_rng(15)
    img = np.full((96, 128), 40.0, np.float32)
    img[20:60, 30:80] = 200.0                      # bright rectangle
    img += rng.normal(0, 4, img.shape)
    jimg = jnp.asarray(img)

    ok = True
    # blur reduces noise variance but keeps the mean
    g = np.asarray(blur.gaussian(jimg, sigma=2.0))
    m = np.asarray(blur.mean(jimg, radius=3))
    med = np.asarray(blur.median(jimg, radius=2))
    for name, out in [("gaussian", g), ("mean", m), ("median", med)]:
        flat = out[70:90, 90:120]
        print(f"{name:9s} blur: flat-region std {flat.std():.2f} "
              f"(input {img[70:90, 90:120].std():.2f})")
        ok &= flat.std() < img[70:90, 90:120].std()

    # sobel responds on the rectangle's edges, not inside
    gx, gy = derivative.sobel(jnp.asarray(g))
    mag = np.abs(np.asarray(gx)) + np.abs(np.asarray(gy))
    edge = mag[18:62, 28:82].max()
    interior = mag[35:50, 45:65].mean()
    print(f"sobel: edge response {edge:.0f}, interior {interior:.1f}")
    ok &= edge > 20 * max(interior, 1e-3)

    # Otsu threshold + morphology + blob count
    t = threshold.compute_otsu(jimg, float(img.min()), float(img.max()))
    bw = threshold.threshold(jimg, t, down=False)   # bright blob
    bw = binary.erode4(binary.dilate4(bw))
    contours = binary.contour_external(np.asarray(bw).astype(np.uint8))
    print(f"otsu threshold {float(t):.0f}; blobs found: {len(contours)}")
    ok &= len(contours) == 1
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
