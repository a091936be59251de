"""Stabilize a jittery video sequence.

Reference analog: examples/geometry/ExampleVideoStabilization.java — the
same KLT + robust 2D-motion machinery as mosaicking, but every frame is
warped back into the FIRST frame's coordinate system.  Frames are crops
of one texture with random jitter; stabilization must cancel it.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    from boofcv_tpu.io import simulate
    from boofcv_tpu.sfm import stitch2d

    rng = np.random.default_rng(23)
    tex = simulate.noise_texture(rng, size=320, octaves=5)
    h, w = 120, 160
    jitter = [(0, 0)] + [tuple(rng.integers(-6, 7, 2)) for _ in range(5)]
    frames = [tex[40 + dy:40 + dy + h, 40 + dx:40 + dx + w]
              .astype(np.float32) for dy, dx in jitter]

    # stabilization = mosaic into a frame-0-sized canvas: the recovered
    # H_mosaic_from_frame IS the stabilizing warp
    st = stitch2d.Stitcher(mosaic_h=h, mosaic_w=w, offset=(0.0, 0.0),
                           num_tracks=200)
    ok = True
    errs = []
    for i, f in enumerate(frames):
        assert st.process(f)
        Hm = st.H_mosaic_from_frame
        # expected: pure translation canceling the jitter
        dy, dx = jitter[i]
        err = max(abs(Hm[0, 2] - dx), abs(Hm[1, 2] - dy))
        errs.append(err)
        print(f"frame {i}: jitter ({dy:+d}, {dx:+d}), "
              f"stabilizing shift ({Hm[1, 2]:+.2f}, {Hm[0, 2]:+.2f}), "
              f"err {err:.2f} px")
        ok &= err < 0.8
    # stabilized frames should align with frame 0 where covered
    stab = st.image()
    diff = np.abs(stab[20:-20, 20:-20] - frames[0][20:-20, 20:-20])
    print(f"stabilized-vs-first median |err|: {np.median(diff):.1f}")
    ok &= np.median(diff) < 8.0
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
