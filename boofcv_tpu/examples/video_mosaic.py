"""Build a mosaic from a LONG panning video (rotation + translation).

Reference analog: examples/sfm/ExampleVideoMosaic.java — unlike the
4-frame stitching demo, this drives the Stitcher through a 14-frame
camera sweep with slow rotation, exercising drift accumulation and
re-tracking.  Oracle: accumulated homography drift at a probe point
stays small over the whole sweep and the mosaic covers the swept area.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.io import simulate
    from boofcv_tpu.ip import distort
    from boofcv_tpu.sfm import stitch2d

    rng = np.random.default_rng(5)
    tex = simulate.noise_texture(rng, size=560, octaves=5)
    h, w = 120, 150

    # camera sweep: translation + slow in-plane rotation about the frame
    # center; render each frame by warping the big texture
    frames = []
    gt = []                   # frame -> texture affine (x_tex = A x + b)
    for i in range(14):
        ang = 0.012 * i
        dy, dx = 3.0 * i, 14.0 * i
        c, s = np.cos(ang), np.sin(ang)
        # dst->src map for the warp: texture coords of frame pixel (x, y)
        A = np.array([[c, -s], [s, c]])
        b = np.array([dx + 30, dy + 30]) - A @ np.array([w / 2, h / 2]) \
            + np.array([w / 2, h / 2])
        Hm = np.eye(3)
        Hm[:2, :2] = A
        Hm[:2, 2] = b
        f = np.asarray(distort.warp_homography(
            jnp.asarray(tex.astype(np.float32)), jnp.asarray(Hm), (h, w)))
        frames.append(f)
        gt.append((A, b))

    st = stitch2d.Stitcher(mosaic_h=260, mosaic_w=420, offset=(30.0, 30.0),
                           num_tracks=250)
    for f in frames:
        if not st.process(f):
            print("FAILED (lost registration)")
            return 1

    # probe: frame-13 center must land where its texture content says
    A, b = gt[-1]
    probe = np.array([w / 2, h / 2])
    tex_xy = A @ probe + b
    # mosaic is anchored to frame 0 (+offset); frame-0 pixel of that
    # texture position: x0 = tex_xy - [30, 30]
    expected = tex_xy - np.array([30, 30]) + np.array([30, 30])
    p = st.H_mosaic_from_frame @ np.array([probe[0], probe[1], 1.0])
    p = p[:2] / p[2]
    drift = np.abs(p - expected).max()
    sweep = 14.0 * 13
    cov = float((np.asarray(st.weight) > 0).mean())
    print(f"14-frame sweep with rotation: final drift {drift:.2f} px "
          f"({drift / sweep:.1%} of the {sweep:.0f} px sweep), "
          f"mosaic coverage {cov:.0%}")
    ok = drift < 0.05 * sweep and cov > 0.3
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
