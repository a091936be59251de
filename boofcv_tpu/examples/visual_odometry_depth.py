"""RGB-D visual odometry over a simulated depth-sensor sequence.

Reference analog: examples/sfm/ExampleVisualOdometryDepth.java — the
PixelDepth+PnP VO state machine fed by a registered depth image instead
of sparse stereo.  Oracle: recovered camera centers track the simulated
forward trajectory.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.geo import se3
    from boofcv_tpu.io import simulate
    from boofcv_tpu.sfm import stereo_vo, depth_vo

    H, W = 120, 160
    K = np.array([[150.0, 0, W / 2], [0, 150.0, H / 2], [0, 0, 1.0]])
    rng = np.random.default_rng(0)
    tex = simulate.noise_texture(rng)
    o = np.array([0.0, 0.0, 6.0])
    ex = np.array([1.0, 0.0, 0.0])
    ey = np.array([0.0, 1.0, -0.15])
    n = np.cross(ex, ey)
    n /= np.linalg.norm(n)
    poses, frames = [], []
    Kinv = np.linalg.inv(K)
    ys, xs = np.mgrid[0:H, 0:W].astype(float)
    for i in range(6):
        R = np.asarray(se3.exp_so3(jnp.asarray([0.0, 0.003 * i, 0.0])))
        c = np.array([0.01 * i, 0.0, 0.05 * i])
        t = -R @ c
        poses.append((R, t))
        gray = simulate.render_plane(tex, K, jnp.asarray(R),
                                     jnp.asarray(t), H, W,
                                     plane_origin=tuple(o),
                                     plane_x=tuple(ex), plane_y=tuple(ey))
        rays = np.stack([xs, ys, np.ones_like(xs)], -1) @ Kinv.T
        d_w = rays @ R
        denom = d_w @ n
        s = ((o - c) @ n) / np.where(np.abs(denom) < 1e-12, 1e-12, denom)
        Xc = ((c + s[..., None] * d_w) @ R.T) + t
        depth = np.where(s > 0, Xc[..., 2], 0.0).astype(np.float32)
        frames.append((np.asarray(gray), depth))

    cfg = stereo_vo.StereoVoConfig(num_tracks=256, pyramid_scales=(1, 2, 4),
                                   detect_radius=4)
    vo = depth_vo.DepthVisualOdometry(cfg, K, H, W)
    errs = []
    for (gray, depth), (Rgt, tgt) in zip(frames, poses):
        ok = vo.process(gray, depth)
        _, c_est = vo.camera_to_world()
        c_gt = -Rgt.T @ tgt
        errs.append(np.linalg.norm(c_est - c_gt))
        if not ok:
            print("FAILED (lost pose)")
            return 1
    print(f"frames: {len(frames)}, final center error: {errs[-1]:.4f} m "
          f"(trajectory length {np.linalg.norm(poses[-1][1]):.2f} m)")
    ok = errs[-1] < 0.05
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
