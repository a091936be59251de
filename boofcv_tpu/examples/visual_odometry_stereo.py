"""Stereo visual odometry — the flagship pipeline.

Reference analog: examples/sfm/ExampleVisualOdometryStereo.java — the
PixelDepth+PnP state machine (KLT tracking, sparse stereo depth,
RANSAC-P3P, refine) as ONE jitted per-frame program.  Oracle: the
simulated forward trajectory is recovered with small absolute error.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.geo import se3
    from boofcv_tpu.io import simulate
    from boofcv_tpu.sfm import stereo_vo

    H, W = 120, 160
    K = np.array([[150.0, 0, W / 2], [0, 150.0, H / 2], [0, 0, 1.0]])
    B = 0.3
    rng = np.random.default_rng(0)
    poses = []
    for i in range(8):
        R = np.asarray(se3.exp_so3(jnp.asarray([0.0, 0.004 * i, 0.0])))
        c = np.array([0.015 * i, 0.0, 0.06 * i])
        poses.append((jnp.asarray(R), jnp.asarray(-R @ c)))
    frames = simulate.render_stereo_sequence(rng, K, B, poses, H, W)

    cfg = stereo_vo.StereoVoConfig(
        num_tracks=256, pyramid_scales=(1, 2, 4), max_disparity=48,
        ransac_hypotheses=192, detect_radius=4)
    vo = stereo_vo.StereoVisualOdometry(cfg, K, B, H, W)
    errs = []
    for (left, right), (Rgt, tgt) in zip(frames, poses):
        if not vo.process(left, right):
            print("FAILED (motion estimation)")
            return 1
        _, c_est = vo.camera_to_world()
        c_gt = -np.asarray(Rgt).T @ np.asarray(tgt)
        errs.append(np.linalg.norm(c_est - c_gt))
    total = np.linalg.norm(-np.asarray(poses[-1][0]).T
                           @ np.asarray(poses[-1][1]))
    print(f"frames: {len(frames)}, ATE {np.mean(errs):.4f} m over a "
          f"{total:.2f} m trajectory; inliers "
          f"{vo.metrics.get('inliers', 0)}")
    ok = np.mean(errs) < 0.05 * max(total, 0.1)
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
