"""Zhang99 calibration oracle: synthetic target views with known K +
distortion must be recovered (reference test strategy for
CalibrationPlanarGridZhang99)."""

import numpy as np
import jax.numpy as jnp

from boofcv_tpu.calib import zhang99
from boofcv_tpu.geo import se3


def make_target(nx=7, ny=5, spacing=0.03):
    xs, ys = np.meshgrid(np.arange(nx) * spacing, np.arange(ny) * spacing)
    pts = np.stack([xs.ravel(), ys.ravel()], 1)
    return pts - pts.mean(0)


def project_brown(world_xy, K, k1, k2, R, t):
    w3 = np.concatenate([world_xy, np.zeros((len(world_xy), 1))], 1)
    Xc = w3 @ R.T + t
    xn = Xc[:, :2] / Xc[:, 2:]
    r2 = np.sum(xn ** 2, 1, keepdims=True)
    xd = xn * (1 + k1 * r2 + k2 * r2 ** 2)
    u = K[0, 0] * xd[:, 0] + K[0, 1] * xd[:, 1] + K[0, 2]
    v = K[1, 1] * xd[:, 1] + K[1, 2]
    return np.stack([u, v], 1)


def make_views(rng, world_xy, K, k1, k2, n_views=6, noise=0.0):
    obs, Rs, ts = [], [], []
    for v in range(n_views):
        w = np.array([0.35, -0.3, 0.1]) * rng.uniform(-1, 1, 3)
        R = np.asarray(se3.exp_so3(jnp.asarray(w)))
        t = np.array([rng.uniform(-0.05, 0.05), rng.uniform(-0.05, 0.05),
                      rng.uniform(0.35, 0.6)])
        p = project_brown(world_xy, K, k1, k2, R, t)
        obs.append(p + rng.normal(0, noise, p.shape))
        Rs.append(R)
        ts.append(t)
    return np.stack(obs), np.stack(Rs), np.stack(ts)


K_GT = np.array([[420.0, 0.0, 320.0], [0.0, 415.0, 240.0], [0.0, 0.0, 1.0]])


def test_k_from_homographies_no_distortion():
    rng = np.random.default_rng(0)
    tgt = make_target()
    obs, _, _ = make_views(rng, tgt, K_GT, 0.0, 0.0)
    Hs = zhang99.homographies_per_view(tgt, obs)
    K = zhang99.k_from_homographies(np.asarray(Hs))
    np.testing.assert_allclose(K[0, 0], 420.0, rtol=0.02)
    np.testing.assert_allclose(K[1, 1], 415.0, rtol=0.02)
    np.testing.assert_allclose(K[0, 2], 320.0, atol=8)


def test_full_calibration_with_distortion():
    rng = np.random.default_rng(1)
    tgt = make_target()
    k1, k2 = -0.25, 0.08
    obs, Rs, ts = make_views(rng, tgt, K_GT, k1, k2, n_views=8)
    res = zhang99.calibrate_mono_planar(tgt, obs)
    assert res.reprojection_rmse < 1e-6
    np.testing.assert_allclose(res.K[0, 0], 420.0, rtol=1e-4)
    np.testing.assert_allclose(res.K[1, 1], 415.0, rtol=1e-4)
    np.testing.assert_allclose(res.K[0, 2], 320.0, atol=0.05)
    np.testing.assert_allclose(res.K[1, 2], 240.0, atol=0.05)
    np.testing.assert_allclose(res.radial[0], k1, atol=1e-3)
    np.testing.assert_allclose(res.radial[1], k2, atol=1e-3)


def test_calibration_with_noise():
    rng = np.random.default_rng(2)
    tgt = make_target()
    obs, _, _ = make_views(rng, tgt, K_GT, -0.2, 0.05, n_views=10,
                           noise=0.3)
    res = zhang99.calibrate_mono_planar(tgt, obs)
    assert res.reprojection_rmse < 0.5  # near the injected noise
    np.testing.assert_allclose(res.K[0, 0], 420.0, rtol=0.02)


def test_stereo_calibration():
    rng = np.random.default_rng(3)
    tgt = make_target()
    R_rel = np.asarray(se3.exp_so3(jnp.asarray([0.004, 0.01, -0.002])))
    t_rel = np.array([-0.12, 0.001, 0.003])
    obs_l, Rs, ts = make_views(rng, tgt, K_GT, -0.1, 0.0, n_views=6)
    obs_r = []
    for v in range(len(Rs)):
        Rr = R_rel @ Rs[v]
        tr = R_rel @ ts[v] + t_rel
        obs_r.append(project_brown(tgt, K_GT, -0.1, 0.0, Rr, tr))
    left, right, Rlr, tlr = zhang99.calibrate_stereo_planar(
        tgt, obs_l, np.stack(obs_r))
    np.testing.assert_allclose(Rlr, R_rel, atol=1e-5)
    np.testing.assert_allclose(tlr, t_rel, atol=1e-5)


def test_calibration_from_rendered_images_end_to_end():
    """VERDICT r1 #7 'Done' criterion: image in -> intrinsics out.

    Renders a finite chessboard target through known cameras
    (io.simulate.render_plane), detects it per view with the hardened
    x-corner pipeline (ring validation + perspective-robust lattice
    ordering), runs Zhang99, and requires K within 1%.
    """
    from boofcv_tpu.io import simulate
    from boofcv_tpu.recognition import chessboard

    rng = np.random.default_rng(0)
    rows, cols = 5, 6
    square, tw = 36, 512
    tex = np.full((tw, tw), 230.0, np.float32)
    bh, bwd = (rows + 1) * square, (cols + 1) * square
    by, bx = (tw - bh) // 2, (tw - bwd) // 2
    yy, xx = np.mgrid[0:bh, 0:bwd]
    tex[by:by + bh, bx:bx + bwd] = \
        (((yy // square) + (xx // square)) % 2) * 190.0 + 30.0
    tex += rng.normal(0, 2.0, tex.shape).astype(np.float32)

    H, W, f = 480, 640, 520.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    scale = 40.0
    ey = np.array([0.0, 1.0, -0.15])
    world = []
    for j in range(rows):
        for i in range(cols):
            u = (bx + (i + 1) * square - tw / 2) / scale
            v = (by + (j + 1) * square - tw / 2) / scale
            world.append([u, v * np.linalg.norm(ey)])
    world = np.array(world)

    poses = [(-0.22, 0.1, 0.02, (0.15, 0.05)),
             (0.18, -0.15, -0.05, (-0.15, 0.1)),
             (0.05, 0.28, 0.1, (0.05, -0.15)),
             (-0.12, -0.22, 0.0, (0.1, 0.15))]
    obs = []
    for wx, wy, wz, (sx, sy) in poses:
        R = np.asarray(se3.exp_so3(jnp.asarray([wx, wy, wz])))
        t = -R @ np.array([sx, sy, 0.0])
        img = simulate.render_plane(
            jnp.asarray(tex), K, jnp.asarray(R), jnp.asarray(t), H, W,
            plane_origin=(0.0, 0.0, 10.5), texture_scale=scale,
            background=235.0)
        grid = chessboard.detect_chessboard(img, rows, cols)
        assert grid is not None
        obs.append(grid)

    res = zhang99.calibrate_mono_planar(world, np.stack(obs))
    Kf = np.asarray(res.K)
    assert abs(Kf[0, 0] - f) / f < 0.01
    assert abs(Kf[1, 1] - f) / f < 0.01
    assert abs(Kf[0, 2] - W / 2) < 4.0
    assert abs(Kf[1, 2] - H / 2) < 4.0
