"""Simulated end-to-end stereo VO test (SURVEY §4.5: the reference's
CheckVisualOdometryStereoSim drives a camera forward over a synthetic
scene and asserts the recovered pose within tolerance)."""

import numpy as np
import jax.numpy as jnp
import pytest

from boofcv_tpu.geo import se3
from boofcv_tpu.io import simulate
from boofcv_tpu.sfm import stereo_vo


H, W = 120, 160
K = np.array([[150.0, 0.0, W / 2], [0.0, 150.0, H / 2], [0.0, 0.0, 1.0]])
BASELINE = 0.3


def make_forward_trajectory(n_frames=8, step=0.06, yaw_rate=0.004):
    """world->camera poses for a camera creeping forward with gentle yaw."""
    poses = []
    for i in range(n_frames):
        yaw = yaw_rate * i
        Rcw = np.asarray(se3.exp_so3(jnp.asarray([0.0, yaw, 0.0])))
        c = np.array([0.015 * i, 0.0, step * i])  # camera center in world
        R = Rcw.T
        t = -R @ c
        poses.append((jnp.asarray(R), jnp.asarray(t)))
    return poses


@pytest.fixture(scope="module")
def vo_run():
    rng = np.random.default_rng(0)
    poses = make_forward_trajectory()
    frames = simulate.render_stereo_sequence(rng, K, BASELINE, poses, H, W)
    cfg = stereo_vo.StereoVoConfig(
        num_tracks=256, pyramid_scales=(1, 2, 4), max_disparity=48,
        ransac_hypotheses=192, detect_radius=4)
    vo = stereo_vo.StereoVisualOdometry(cfg, K, BASELINE, H, W)
    traj = []
    oks = []
    for left, right in frames:
        oks.append(vo.process(left, right))
        R, c = vo.camera_to_world()
        traj.append((R, c))
    return poses, traj, oks, vo


def test_vo_processes_all_frames(vo_run):
    _, _, oks, vo = vo_run
    assert all(oks)
    assert vo.metrics["inliers"] > 30


def test_vo_recovers_trajectory(vo_run):
    poses, traj, _, _ = vo_run
    # ground-truth camera centers
    errs = []
    for (Rgt, tgt), (Rest, cest) in zip(poses, traj):
        c_gt = -np.asarray(Rgt).T @ np.asarray(tgt)
        errs.append(np.linalg.norm(cest - c_gt))
    total_motion = np.linalg.norm(
        -np.asarray(poses[-1][0]).T @ np.asarray(poses[-1][1]))
    ate = float(np.mean(errs))
    # reference tolerance style: translation error below a fraction of motion
    assert ate < 0.15 * max(total_motion, 0.1), (ate, errs)


def test_vo_rotation_error_small(vo_run):
    poses, traj, _, _ = vo_run
    Rgt = np.asarray(poses[-1][0])
    Rest = traj[-1][0]
    # camera_to_world returns R s.t. columns are camera axes in world
    dR = Rest.T @ Rgt.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 2.0, ang


def test_sequence_runner_matches_stepwise(vo_run):
    """The scan-based sequence runner must be bitwise-identical to the
    per-frame step driver (it IS the same step, scanned)."""
    poses, _, _, _ = vo_run
    rng = np.random.default_rng(0)
    frames = simulate.render_stereo_sequence(rng, K, BASELINE, poses, H, W)
    cfg = stereo_vo.StereoVoConfig(
        num_tracks=256, pyramid_scales=(1, 2, 4), max_disparity=48,
        ransac_hypotheses=192, detect_radius=4)
    boot = stereo_vo.make_bootstrap(cfg, K, BASELINE)
    state0 = boot(stereo_vo.init_state(cfg, H, W),
                  jnp.asarray(frames[0][0]), jnp.asarray(frames[0][1]))
    step = stereo_vo.make_step(cfg, K, BASELINE)
    s = state0
    Rs_ref, ts_ref = [], []
    for left, right in frames[1:]:
        s, _ = step(s, jnp.asarray(left), jnp.asarray(right))
        Rs_ref.append(np.asarray(s.R))
        ts_ref.append(np.asarray(s.t))
    run = stereo_vo.make_sequence_runner(cfg, K, BASELINE)
    lefts = jnp.stack([jnp.asarray(l) for l, _ in frames[1:]])
    rights = jnp.stack([jnp.asarray(r) for _, r in frames[1:]])
    s2, ((Rs, ts), ms) = run(state0, lefts, rights)
    assert np.allclose(np.asarray(Rs), np.stack(Rs_ref), atol=1e-12)
    assert np.allclose(np.asarray(ts), np.stack(ts_ref), atol=1e-12)
    assert (np.asarray(s2.alive) == np.asarray(s.alive)).all()


def test_batched_vo_matches_single_stream():
    """make_batched_step: B identical streams (same seed) must reproduce
    the single-stream trajectory exactly; distinct seeds must all track."""
    rng = np.random.default_rng(1)
    poses = make_forward_trajectory(n_frames=5)
    frames = simulate.render_stereo_sequence(rng, K, BASELINE, poses, H, W)
    cfg = stereo_vo.StereoVoConfig(
        num_tracks=256, pyramid_scales=(1, 2, 4), max_disparity=48,
        ransac_hypotheses=192, detect_radius=4)

    # single stream
    s1 = stereo_vo.init_state(cfg, H, W, seed=0)
    boot = stereo_vo.make_bootstrap(cfg, K, BASELINE)
    step = stereo_vo.make_step(cfg, K, BASELINE)
    s1 = boot(s1, jnp.asarray(frames[0][0]), jnp.asarray(frames[0][1]))
    traj1 = []
    for l, r in frames[1:]:
        s1, m = step(s1, jnp.asarray(l), jnp.asarray(r))
        traj1.append(np.asarray(s1.t))

    # batched: stream 0 = same seed/frames, stream 1 = same frames with
    # a different RANSAC seed
    B = 2
    sb = stereo_vo.init_batched_state(cfg, B, H, W, seed=0)
    bboot = stereo_vo.make_batched_bootstrap(cfg, K, BASELINE)
    bstep = stereo_vo.make_batched_step(cfg, K, BASELINE)
    l0 = jnp.broadcast_to(jnp.asarray(frames[0][0]), (B, H, W))
    r0 = jnp.broadcast_to(jnp.asarray(frames[0][1]), (B, H, W))
    sb = bboot(sb, l0, r0)
    trajb = []
    for l, r in frames[1:]:
        lb = jnp.broadcast_to(jnp.asarray(l), (B, H, W))
        rb = jnp.broadcast_to(jnp.asarray(r), (B, H, W))
        sb, mb = bstep(sb, lb, rb)
        trajb.append(np.asarray(sb.t))

    for t1, tb in zip(traj1, trajb):
        # not bitwise: vmap changes XLA fusion/reduction order; the
        # same-seed stream must still agree to numerical noise
        assert np.allclose(tb[0], t1, atol=1e-4), (t1, tb[0])
        # stream 1 (different key) also tracks the same motion
        assert np.linalg.norm(tb[1] - t1) < 0.05


def test_batched_sequence_runner_shapes():
    rng = np.random.default_rng(2)
    poses = make_forward_trajectory(n_frames=4)
    frames = simulate.render_stereo_sequence(rng, K, BASELINE, poses, H, W)
    cfg = stereo_vo.StereoVoConfig(
        num_tracks=128, pyramid_scales=(1, 2), max_disparity=32,
        ransac_hypotheses=128, detect_radius=4)
    B = 3
    sb = stereo_vo.init_batched_state(cfg, B, H, W)
    bboot = stereo_vo.make_batched_bootstrap(cfg, K, BASELINE)
    l0 = jnp.broadcast_to(jnp.asarray(frames[0][0]), (B, H, W))
    r0 = jnp.broadcast_to(jnp.asarray(frames[0][1]), (B, H, W))
    sb = bboot(sb, l0, r0)
    run = stereo_vo.make_batched_sequence_runner(cfg, K, BASELINE)
    T = len(frames) - 1
    lefts = jnp.stack([jnp.broadcast_to(jnp.asarray(l), (B, H, W))
                       for l, _ in frames[1:]])
    rights = jnp.stack([jnp.broadcast_to(jnp.asarray(r), (B, H, W))
                        for _, r in frames[1:]])
    sb, ((Rs, ts), ms) = run(sb, lefts, rights)
    assert Rs.shape == (T, B, 3, 3) and ts.shape == (T, B, 3)
    assert bool(ms["pose_ok"].all())
