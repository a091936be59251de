"""Simulated end-to-end tests for the quad-PnP, dual-tracker, and
overhead-view VO variants (same oracle style as the reference's
CheckVisualOdometryStereoSim / CheckVisualOdometryMonoPlaneSim)."""

import numpy as np
import jax.numpy as jnp
import pytest

from boofcv_tpu.geo import se3
from boofcv_tpu.io import simulate
from boofcv_tpu.sfm import dual_track_vo, overhead_vo, quad_vo


H, W = 120, 160
K = np.array([[150.0, 0.0, W / 2], [0.0, 150.0, H / 2], [0.0, 0.0, 1.0]])
BASELINE = 0.3


def make_forward_trajectory(n_frames=6, step=0.06):
    poses = []
    for i in range(n_frames):
        R = np.eye(3)
        c = np.array([0.01 * i, 0.0, step * i])
        poses.append((jnp.asarray(R), jnp.asarray(-R @ c)))
    return poses


def ate_of(poses, traj):
    errs = []
    for (Rgt, tgt), (_, cest) in zip(poses, traj):
        c_gt = -np.asarray(Rgt).T @ np.asarray(tgt)
        errs.append(np.linalg.norm(cest - c_gt))
    return float(np.mean(errs))


def run_vo(vo, frames):
    traj = []
    oks = []
    for left, right in frames:
        oks.append(vo.process(left, right))
        traj.append(vo.camera_to_world())
    return traj, oks


@pytest.fixture(scope="module")
def stereo_frames():
    rng = np.random.default_rng(3)
    poses = make_forward_trajectory()
    frames = simulate.render_stereo_sequence(rng, K, BASELINE, poses, H, W)
    return poses, frames


def test_quad_vo_recovers_motion(stereo_frames):
    poses, frames = stereo_frames
    cfg = quad_vo.QuadVoConfig(num_features=192, max_disparity=48,
                               ransac_hypotheses=192)
    vo = quad_vo.QuadVisualOdometry(cfg, K, BASELINE)
    traj, oks = run_vo(vo, frames)
    assert all(oks[1:]), oks
    total = np.linalg.norm(-np.asarray(poses[-1][0]).T
                           @ np.asarray(poses[-1][1]))
    assert ate_of(poses, traj) < 0.25 * max(total, 0.1)


def test_dual_track_vo_recovers_motion(stereo_frames):
    poses, frames = stereo_frames
    cfg = dual_track_vo.DualTrackVoConfig(
        num_tracks=256, pyramid_scales=(1, 2, 4), max_disparity=48,
        ransac_hypotheses=192, detect_radius=4)
    vo = dual_track_vo.DualTrackVisualOdometry(cfg, K, BASELINE)
    traj, oks = run_vo(vo, frames)
    assert all(oks), oks
    assert vo.metrics["inliers"] > 30
    total = np.linalg.norm(-np.asarray(poses[-1][0]).T
                           @ np.asarray(poses[-1][1]))
    assert ate_of(poses, traj) < 0.15 * max(total, 0.1)


# ---------------------------------------------------------------------------
# Overhead (bird's-eye) mono plane VO
# ---------------------------------------------------------------------------

def test_overhead_map_projects_plane_points():
    h = 1.5
    omap = overhead_vo.create_overhead_map(
        K, np.eye(3), np.array([0.0, h, 0.0]), H, W,
        oh=160, ow=160, cell=0.05, center_x=-4.0, center_z=1.0)
    # plane point (0, 0, 5) (plane coords) = world (0, h, 5): projects to
    # the image center column, below the horizon
    r = 160 - 1 - int(round((5.0 - 1.0) / 0.05))
    c = int(round((0.0 - (-4.0)) / 0.05))
    assert bool(omap.valid[r, c])
    assert abs(float(omap.map_x[r, c]) - W / 2) < 1.0
    v_expect = 150.0 * h / 5.0 + H / 2
    assert abs(float(omap.map_y[r, c]) - v_expect) < 1.0


def test_overhead_vo_recovers_forward_motion():
    rng = np.random.default_rng(5)
    h = 1.5
    n_frames, step = 6, 0.08
    pitch = 0.6  # camera pitched down so the near ground band is visible
    c_, s_ = np.cos(pitch), np.sin(pitch)
    Rp = np.array([[1.0, 0, 0], [0, c_, -s_], [0, s_, c_]])
    tex = simulate.noise_texture(rng)
    frames = []
    for i in range(n_frames):
        t = -Rp @ np.array([0.0, 0.0, step * i])
        # true ground plane: y = h, u along world x, v along world z
        img = simulate.render_plane(
            tex, K, jnp.asarray(Rp), jnp.asarray(t), H, W,
            plane_origin=(0.0, h, 0.0), plane_x=(1.0, 0.0, 0.0),
            plane_y=(0.0, 0.0, 1.0), texture_scale=60.0)
        frames.append(img)

    vo = overhead_vo.MonoOverheadVisualOdometry(
        K, Rp, Rp @ np.array([0.0, h, 0.0]), H, W,
        overhead_shape=(192, 192), cell=0.02, center_z=1.0,
        num_tracks=256)
    for img in frames:
        assert vo.process(img)
    x, z, yaw = vo.plane_motion()
    true_z = step * (n_frames - 1)
    assert abs(z - true_z) < 0.25 * true_z, (x, z, yaw)
    assert abs(x) < 0.1
    assert abs(yaw) < 0.05


def test_ransac_se2_exact():
    import jax
    rng = np.random.default_rng(0)
    ang, tx, ty = 0.3, 4.0, -2.0
    p = jnp.asarray(rng.uniform(-50, 50, (64, 2)))
    ca, sa = np.cos(ang), np.sin(ang)
    q = jnp.stack([ca * p[:, 0] - sa * p[:, 1] + tx,
                   sa * p[:, 0] + ca * p[:, 1] + ty], -1)
    # corrupt 20% with outliers
    q = q.at[:12].add(jnp.asarray(rng.uniform(20, 40, (12, 2))))
    res = overhead_vo.ransac_se2(jax.random.PRNGKey(0), p, q,
                                 inlier_threshold_px=1.0)
    m = np.asarray(res.model)
    assert int(res.num_inliers) >= 50
    assert abs(m[0] - ang) < 1e-6
    assert abs(m[1] - tx) < 1e-5
    assert abs(m[2] - ty) < 1e-5
