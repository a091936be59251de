"""RGB-D VO (feature + direct) simulation oracles."""

import numpy as np
import jax.numpy as jnp
import pytest

from boofcv_tpu.geo import se3
from boofcv_tpu.io import simulate
from boofcv_tpu.sfm import stereo_vo, depth_vo, direct_vo


H, W = 120, 160
K = np.array([[150.0, 0.0, W / 2], [0.0, 150.0, H / 2], [0.0, 0.0, 1.0]])


def render_rgbd(rng, poses, plane_origin=(0, 0, 6.0),
                plane_x=(1, 0, 0), plane_y=(0, 1, -0.15)):
    """Gray + exact depth for the simulated plane world."""
    tex = simulate.noise_texture(rng)
    frames = []
    o = np.asarray(plane_origin, float)
    ex = np.asarray(plane_x, float)
    ey = np.asarray(plane_y, float)
    n = np.cross(ex, ey)
    n /= np.linalg.norm(n)
    for R, t in poses:
        gray = simulate.render_plane(tex, K, R, t, H, W,
                                     plane_origin=plane_origin,
                                     plane_x=plane_x, plane_y=plane_y)
        # exact depth: ray-plane intersection, z-component in camera frame
        Rn = np.asarray(R)
        tn = np.asarray(t)
        ys, xs = np.mgrid[0:H, 0:W].astype(float)
        Kinv = np.linalg.inv(K)
        rays = np.stack([xs, ys, np.ones_like(xs)], -1) @ Kinv.T
        c0 = -Rn.T @ tn
        d_w = rays @ Rn
        denom = d_w @ n
        s = ((o - c0) @ n) / np.where(np.abs(denom) < 1e-12, 1e-12, denom)
        X_w = c0 + s[..., None] * d_w
        Xc = X_w @ Rn.T + tn
        depth = np.where(s > 0, Xc[..., 2], 0.0).astype(np.float32)
        frames.append((np.asarray(gray), depth))
    return frames


def make_traj(n=6, step=0.05):
    poses = []
    for i in range(n):
        R = np.asarray(se3.exp_so3(jnp.asarray([0.0, 0.003 * i, 0.0])))
        c = np.array([0.01 * i, 0.0, step * i])
        poses.append((jnp.asarray(R), jnp.asarray(-R @ c)))
    return poses


def test_depth_vo_recovers_trajectory():
    rng = np.random.default_rng(0)
    poses = make_traj()
    frames = render_rgbd(rng, poses)
    cfg = stereo_vo.StereoVoConfig(num_tracks=256, pyramid_scales=(1, 2, 4),
                                   ransac_hypotheses=192, detect_radius=4)
    vo = depth_vo.DepthVisualOdometry(cfg, K, H, W)
    errs = []
    for (gray, depth), (Rgt, tgt) in zip(frames, poses):
        assert vo.process(gray, depth)
        _, c = vo.camera_to_world()
        c_gt = -np.asarray(Rgt).T @ np.asarray(tgt)
        errs.append(np.linalg.norm(c - c_gt))
    assert np.mean(errs) < 0.05, errs


def test_direct_vo_recovers_trajectory():
    rng = np.random.default_rng(1)
    poses = make_traj(n=5, step=0.04)
    frames = render_rgbd(rng, poses)
    vo = direct_vo.DirectDepthVisualOdometry(K)
    errs = []
    for (gray, depth), (Rgt, tgt) in zip(frames, poses):
        assert vo.process(gray, depth)
        _, c = vo.camera_to_world()
        c_gt = -np.asarray(Rgt).T @ np.asarray(tgt)
        errs.append(np.linalg.norm(c - c_gt))
    assert np.mean(errs) < 0.03, errs
