"""Background subtraction from a MOVING (panning) camera.

Reference analog: examples/segmentation/ExampleBackgroundRemovalMoving
.java — the background model lives in a "home" frame; each frame is
registered to it by a homography (here the known pan; in the reference a
tracker estimates it) before update/segment.  Oracle: a moving blob is
segmented despite the camera panning over a static textured scene.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.feature import background as bg

    rng = np.random.default_rng(12)
    world = rng.normal(120, 25, (160, 260)).astype(np.float32)
    from scipy.ndimage import gaussian_filter
    world = gaussian_filter(world, 2.0)
    H, W = 120, 160

    def frame(t, blob=None):
        ox = 8 * t                              # camera pans right
        img = world[20:20 + H, ox:ox + W].copy()
        mask = np.zeros((H, W), bool)
        if blob is not None:
            blob_cy, blob_cx = blob
            yy, xx = np.mgrid[0:H, 0:W]
            mask = (yy - blob_cy) ** 2 \
                + (xx - (blob_cx - ox)) ** 2 < 10 ** 2
            img[mask] = 240.0
        # homography home->current: pure translation by the pan
        Hm = np.array([[1.0, 0, -ox], [0, 1.0, 0], [0, 0, 1.0]])
        return img, Hm, mask

    model = bg.moving_init((H, W + 8 * 6))       # home frame covers the pan
    # learn the background while panning over the empty scene
    for t in range(6):
        img, Hm, _ = frame(t)
        model = bg.moving_basic_update(model, jnp.asarray(img),
                                       jnp.asarray(Hm), learn_rate=0.4)
    # an object enters while the camera is mid-pan
    img, Hm, blob = frame(3, blob=(30, 95))
    seg = np.asarray(bg.moving_basic_segment(model, jnp.asarray(img),
                                             jnp.asarray(Hm),
                                             threshold=35.0))
    det = seg == 1
    iou = (det & blob).sum() / max((det | blob).sum(), 1)
    fp = (det & ~blob).mean()
    print(f"moving-camera segmentation IoU {iou:.2f}, false-positive "
          f"rate {fp:.3f} (known pixels {np.mean(seg != 2):.2f})")
    ok = iou > 0.6 and fp < 0.02
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
