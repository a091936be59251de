"""Global vs adaptive thresholding under uneven illumination.

Reference analog: examples/imageprocessing/ExampleThresholding.java —
global/Otsu breaks under an illumination gradient while local
(mean/Sauvola/block) techniques recover the shapes.  Oracle: IoU of the
recovered dark text-like shapes against ground truth.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.ip import threshold

    rng = np.random.default_rng(9)
    h, w = 120, 200
    yy, xx = np.mgrid[0:h, 0:w]
    # dark glyph blocks on paper with a strong illumination ramp
    truth = np.zeros((h, w), bool)
    for (cy, cx) in [(30, 30), (30, 100), (30, 170), (85, 60), (85, 140)]:
        truth |= (np.abs(yy - cy) < 12) & (np.abs(xx - cx) < 14) \
            & ((yy + xx) % 7 < 5)
    illum = 90 + 140 * xx / w
    img = np.where(truth, 0.35, 1.0) * illum
    img += rng.normal(0, 3, img.shape)
    imgj = jnp.asarray(img, jnp.float32)

    def iou(mask):
        m = np.asarray(mask) > 0
        return (m & truth).sum() / max((m | truth).sum(), 1)

    t_otsu = float(threshold.compute_otsu(imgj, float(img.min()),
                                          float(img.max())))
    global_m = threshold.threshold(imgj, t_otsu, down=True)
    local_m = threshold.local_mean(imgj, radius=20)
    sauvola_m = threshold.sauvola(imgj, radius=20, k=0.3)
    block_m = threshold.block_min_max(imgj, block_size=24)

    scores = {"global-otsu": iou(global_m), "local-mean": iou(local_m),
              "sauvola": iou(sauvola_m), "block-min-max": iou(block_m)}
    for k, v in scores.items():
        print(f"{k:14s} IoU {v:.2f}")
    ok = (scores["local-mean"] > 0.8 and scores["sauvola"] > 0.8
          and scores["block-min-max"] > 0.6
          and scores["global-otsu"] < scores["sauvola"] - 0.1)
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
