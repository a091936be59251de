"""Corner detection: intensity operators + non-maximum suppression.

Reference analog: examples/features/ExampleCornerFeature.java +
ExampleInterestPoint.java + ExampleNonMaximumSupression.java —
Shi-Tomasi / Harris / FAST intensities through block nonmax + top-K
select.  Oracle: a rendered checkerboard's interior crossings are found
by the gradient operators; FAST finds the 4 corners of a bright square.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.feature import intensity, extract

    sq = 20
    board = np.zeros((120, 160), np.float32)
    yy, xx = np.mgrid[0:120, 0:160]
    board[((yy // sq) + (xx // sq)) % 2 == 0] = 200.0

    crossings = [(r * sq - 0.5, c * sq - 0.5)
                 for r in range(1, 6) for c in range(1, 8)]

    results = {}
    for name, fn in (("shi-tomasi",
                      lambda im: intensity.shi_tomasi(im, radius=2)),
                     ("harris",
                      lambda im: intensity.harris(im, radius=2))):
        inten = fn(jnp.asarray(board))
        det = extract.detect(inten, max_features=40, radius=5,
                             threshold=1.0, border=6)
        ys = np.asarray(det.ys)[np.asarray(det.valid)]
        xs = np.asarray(det.xs)[np.asarray(det.valid)]
        hits = 0
        for cy, cx in crossings:
            d = np.hypot(ys - cy, xs - cx)
            hits += int(len(d) > 0 and d.min() < 3.0)
        results[name] = (hits, len(ys))
        print(f"{name:10s}: {hits}/{len(crossings)} crossings hit "
              f"({len(ys)} detections)")

    # FAST: a bright square on dark (saddles have two 8-runs, not 9)
    sq_img = np.zeros((80, 100), np.float32)
    sq_img[25:55, 35:75] = 220.0
    f_inten, is_corner = intensity.fast(jnp.asarray(sq_img))
    det = extract.detect(jnp.where(is_corner, f_inten, 0.0),
                         max_features=10, radius=4,
                         threshold=10.0, border=3)
    ys = np.asarray(det.ys)[np.asarray(det.valid)]
    xs = np.asarray(det.xs)[np.asarray(det.valid)]
    corners = [(25, 35), (25, 74), (54, 35), (54, 74)]
    fast_hits = sum(int(np.hypot(ys - cy, xs - cx).min() < 3.0)
                    for cy, cx in corners if len(ys))
    print(f"fast9     : {fast_hits}/4 square corners ({len(ys)} detections)")
    ok = (results["shi-tomasi"][0] >= 30 and results["harris"][0] >= 30
          and fast_hits == 4)
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
