"""Rectify a calibrated stereo pair.

Reference analog: examples/stereo/ExampleRectifyCalibratedStereo.java —
compute rectifying homographies from the calibrated rig, warp both
images, verify epipolar rows align.  Oracle: corresponding points land
on the same row after rectification, and dense BM on the rectified pair
recovers the scene depth.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.geo import rectify, se3
    from boofcv_tpu.io import simulate
    from boofcv_tpu.ip import distort
    from boofcv_tpu.feature import disparity

    H, W = 160, 220
    K = np.array([[170.0, 0, W / 2], [0, 170.0, H / 2], [0, 0, 1.0]])
    rng = np.random.default_rng(1)
    tex = simulate.noise_texture(rng)
    # a VERGED rig: right camera rotated inward 4 deg (rows misalign
    # without rectification)
    R_rel = np.asarray(se3.exp_so3(jnp.asarray([0.0, -0.07, 0.01])))
    t_rel = np.array([-0.3, 0.0, 0.0])
    R1, t1 = np.eye(3), np.zeros(3)
    left = simulate.render_plane(tex, K, jnp.asarray(R1), jnp.asarray(t1),
                                 H, W, plane_origin=(0.0, 0.0, 5.0),
                                 plane_y=(0.0, 1.0, -0.2),
                                 texture_scale=45.0)
    right = simulate.render_plane(tex, K, jnp.asarray(R_rel),
                                  jnp.asarray(t_rel), H, W,
                                  plane_origin=(0.0, 0.0, 5.0),
                                  plane_y=(0.0, 1.0, -0.2),
                                  texture_scale=45.0)

    rp = rectify.rectify_calibrated(K, K, R_rel, t_rel)
    rl = distort.warp_homography(left, jnp.linalg.inv(rp.rect1), (H, W))
    rr = distort.warp_homography(right, jnp.linalg.inv(rp.rect2), (H, W))

    cfg = disparity.DisparityConfig(max_disparity=48, radius_x=3,
                                    radius_y=3, texture_threshold=0.0)
    d = np.asarray(disparity.block_match(rl, rr, cfg))
    valid = d > 0.5
    # depth from disparity must be ~5 m at the plane center
    Krect = np.asarray(rp.rectK)
    z = Krect[0, 0] * rp.baseline / np.maximum(d, 1e-6)
    center_sl = np.s_[H // 2 - 15:H // 2 + 15, W // 2 - 15:W // 2 + 15]
    z_med = np.median(z[center_sl][valid[center_sl]])
    print(f"rectified-pair valid disparity: {valid.mean():.0%}; center "
          f"depth {z_med:.2f} m (true ~5)")
    ok = valid.mean() > 0.5 and abs(z_med - 5.0) < 0.5
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
