"""Sliding-window BA on a simulated VO run: refinement must not hurt and
should reduce reprojection cost."""

import numpy as np
import jax.numpy as jnp

from boofcv_tpu.geo import se3
from boofcv_tpu.io import simulate
from boofcv_tpu.sfm import stereo_vo, window_ba


def test_window_ba_improves_cost():
    H, W = 120, 160
    K = np.array([[150.0, 0, W / 2], [0, 150.0, H / 2], [0, 0, 1.0]])
    rng = np.random.default_rng(0)
    poses = []
    for i in range(7):
        R = np.asarray(se3.exp_so3(jnp.asarray([0.0, 0.004 * i, 0.0])))
        c = np.array([0.015 * i, 0.0, 0.06 * i])
        poses.append((jnp.asarray(R), jnp.asarray(-R @ c)))
    frames = simulate.render_stereo_sequence(rng, K, 0.3, poses, H, W)
    cfg = stereo_vo.StereoVoConfig(num_tracks=256, pyramid_scales=(1, 2, 4),
                                   max_disparity=48, ransac_hypotheses=192,
                                   detect_radius=4)
    vo = stereo_vo.StereoVisualOdometry(cfg, K, 0.3, H, W)
    wba = window_ba.SlidingWindowBA(window=7)
    fx = fy = 150.0
    cx, cy = W / 2, H / 2
    for left, right in frames:
        assert vo.process(left, right)
        wba.push(vo.state, fx, fy, cx, cy)
    Rv, cv = vo.camera_to_world()
    result = wba.optimize()
    assert result is not None
    refined, info = result
    assert float(info["final_cost"]) <= float(info["initial_cost"])
    # BA must IMPROVE the final camera position vs raw VO
    Rr, tr = refined[-1]
    c_est = -Rr.T @ tr
    c_gt = -np.asarray(poses[-1][0]).T @ np.asarray(poses[-1][1])
    err_ba = np.linalg.norm(c_est - c_gt)
    err_vo = np.linalg.norm(cv - c_gt)
    assert err_ba < 0.02, (err_ba, err_vo)
    assert err_ba < err_vo, (err_ba, err_vo)
