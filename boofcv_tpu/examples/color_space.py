"""Color space conversions and their round trips.

Reference analog: examples/imageprocessing/ExampleColorSpace.java (+
ExampleRgbToGray) — RGB <-> HSV / YUV / LAB conversions.  Oracle: every
round trip reconstructs the input; hue of pure colors lands at the
textbook angles.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.ip import color

    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.uniform(0, 255, (40, 50, 3)).astype(np.float32))

    hsv = color.rgb_to_hsv(rgb)
    back = np.asarray(color.hsv_to_rgb(hsv))
    e_hsv = np.abs(back - np.asarray(rgb)).max()

    yuv = color.rgb_to_yuv(rgb)
    back = np.asarray(color.yuv_to_rgb(yuv))
    e_yuv = np.abs(back - np.asarray(rgb)).max()

    lab = color.rgb_to_lab(rgb / 255.0)
    back = np.asarray(color.lab_to_rgb(lab)) * 255.0
    e_lab = np.abs(back - np.asarray(rgb)).max()

    gray = np.asarray(color.rgb_to_gray(rgb))
    # pure-color hues: red 0, green 2pi/3, blue 4pi/3
    pure = jnp.asarray([[[255.0, 0, 0], [0, 255.0, 0], [0, 0, 255.0]]])
    h = np.asarray(color.rgb_to_hsv(pure))[0, :, 0]
    print(f"round-trip max err: HSV {e_hsv:.3f}, YUV {e_yuv:.3f}, "
          f"LAB {e_lab:.3f}")
    print(f"pure hues: {np.degrees(h).round(1)} deg (expect 0/120/240); "
          f"gray range {gray.min():.0f}..{gray.max():.0f}")
    ok = (e_hsv < 0.1 and e_yuv < 1.0 and e_lab < 1.0
          and np.allclose(np.degrees(h), [0, 120, 240], atol=1.0))
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
