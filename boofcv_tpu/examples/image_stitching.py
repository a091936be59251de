"""Stitch a translating image sequence into a mosaic.

Reference analog: examples/geometry/ExampleImageStitching.java /
ExampleVideoMosaic.java — KLT tracks + robust 2D motion -> warp into a
common canvas.  Frames are crops of one big texture sliding by a known
offset, so the recovered frame-to-mosaic transforms are checkable.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    from boofcv_tpu.io import simulate
    from boofcv_tpu.sfm import stitch2d

    rng = np.random.default_rng(2)
    tex = simulate.noise_texture(rng, size=420, octaves=5)
    h, w = 130, 170
    shifts = [(0, 0), (4, 10), (8, 20), (12, 30)]
    frames = [tex[dy:dy + h, dx:dx + w].astype(np.float32)
              for dy, dx in shifts]

    st = stitch2d.Stitcher(mosaic_h=220, mosaic_w=260, offset=(20.0, 20.0),
                           num_tracks=200)
    errs = []
    for i, f in enumerate(frames):
        assert st.process(f)
        H = st.H_mosaic_from_frame
        # frame pixel (x, y) shows texture (x + dx, y + dy); the mosaic is
        # anchored to frame 0 at +offset, so it lands at (x + dx + 20, ...)
        dy, dx = shifts[i]
        p = H @ np.array([10.0, 10.0, 1.0])
        p = p[:2] / p[2]
        exp = np.array([10.0 + 20 + dx, 10.0 + 20 + dy])
        errs.append(float(np.abs(p - exp).max()))
        print(f"frame {i}: |mosaic_pos - expected|_max = {errs[-1]:.2f} px")

    mosaic = st.image()
    cov = float((np.asarray(st.weight) > 0).mean())
    print(f"mosaic coverage: {cov*100:.0f}% of canvas")
    ok = max(errs) < 1.5 and cov > 0.4
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
