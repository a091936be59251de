"""Trifocal / homography-decompose / self-calibration oracles."""

import numpy as np
import jax.numpy as jnp

from boofcv_tpu.geo import se3, trifocal, selfcalib


def three_view_scene(rng, n=30):
    pts = np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                    rng.uniform(3, 6, n)], 1)
    cams = []
    obs = []
    for v in range(3):
        w = rng.normal(0, 0.03, 3)
        R = np.asarray(se3.exp_so3(jnp.asarray(w)))
        t = np.array([0.3 * v, 0.02 * v, 0.01 * v])
        if v == 0:
            R = np.eye(3)
            t = np.zeros(3)
        cams.append(np.concatenate([R, t[:, None]], 1))
        pc = pts @ R.T + t
        obs.append(pc[:, :2] / pc[:, 2:])
    return pts, cams, obs


def test_trifocal_tensor_from_cameras_transfer():
    rng = np.random.default_rng(0)
    pts, cams, obs = three_view_scene(rng)
    T = trifocal.tensor_from_cameras(jnp.asarray(cams[1]), jnp.asarray(cams[2]))
    pred = np.asarray(trifocal.transfer_1_to_3(
        T, jnp.asarray(obs[0]), jnp.asarray(obs[1])))
    np.testing.assert_allclose(pred, obs[2], atol=1e-9)


def test_trifocal_linear_estimation():
    rng = np.random.default_rng(1)
    pts, cams, obs = three_view_scene(rng, n=20)
    T = trifocal.trifocal_linear(jnp.asarray(obs[0]), jnp.asarray(obs[1]),
                                 jnp.asarray(obs[2]))
    err = np.asarray(trifocal.transfer_error(
        T, jnp.asarray(obs[0]), jnp.asarray(obs[1]), jnp.asarray(obs[2])))
    assert np.sqrt(err.mean()) < 1e-6


def test_homography_decompose_recovers_pose():
    rng = np.random.default_rng(2)
    R_gt = np.asarray(se3.exp_so3(jnp.asarray([0.05, -0.1, 0.02])))
    t_gt = np.array([0.2, -0.05, 0.1])
    n_gt = np.array([0.1, 0.05, 1.0])
    n_gt /= np.linalg.norm(n_gt)
    d = 4.0
    H = R_gt + np.outer(t_gt, n_gt) / d
    sols = selfcalib.homography_decompose(H)
    best = min(sols, key=lambda s: np.abs(s[0] - R_gt).max())
    R, t, n = best
    np.testing.assert_allclose(R, R_gt, atol=1e-8)
    np.testing.assert_allclose(t, t_gt / d, atol=1e-8)
    np.testing.assert_allclose(n, n_gt, atol=1e-8)


def test_self_calibration_recovers_K():
    rng = np.random.default_rng(3)
    # cameras with identical K (normalized: principal point 0)
    f = 1.3
    K = np.array([[f, 0, 0], [0, f, 0], [0, 0, 1.0]])
    Ps = []
    for v in range(4):
        w = rng.normal(0, 0.1, 3)
        R = np.asarray(se3.exp_so3(jnp.asarray(w)))
        t = rng.normal(0, 0.5, 3)
        Ps.append(K @ np.concatenate([R, t[:, None]], 1))
    # apply a random projective distortion: P' = P G, same for all views
    G = np.eye(4) + 0.1 * rng.normal(0, 1, (4, 4))
    Ps_proj = [P @ G for P in Ps]
    Kest, H = selfcalib.self_calibrate_dual_quadratic(np.stack(Ps_proj))
    np.testing.assert_allclose(Kest[0, 0], f, rtol=0.02)
    np.testing.assert_allclose(Kest[1, 1], f, rtol=0.02)
    assert abs(Kest[0, 2]) < 0.05 and abs(Kest[1, 2]) < 0.05
    # rectified cameras must be metric: P H = K [R | t] with valid R
    Pm = Ps_proj[1] @ H
    M = np.linalg.inv(Kest) @ Pm[:, :3]
    s = np.linalg.norm(M[2])
    M /= s
    np.testing.assert_allclose(M @ M.T, np.eye(3), atol=0.05)
