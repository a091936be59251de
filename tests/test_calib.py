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


def test_zhang99_omni_recovers_fisheye():
    """Zhang99CameraUniversalOmni analog: synthetic fisheye observations
    of a planar grid must recover K, xi, and radial terms."""
    from boofcv_tpu.calib import zhang99
    from boofcv_tpu.geo import cameras, se3
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(4)
    cols, rows, sq = 9, 8, 0.07
    xs, ys = np.meshgrid(np.arange(cols) * sq, np.arange(rows) * sq)
    world_xy = np.stack([xs.ravel(), ys.ravel()], 1)
    world_xy -= world_xy.mean(0)
    cam = cameras.CameraUniversalOmni(
        fx=260.0, fy=255.0, cx=160.0, cy=120.0, width=320, height=240,
        radial=(0.05, -0.01), mirror_offset=0.9)
    w3 = np.concatenate([world_xy, np.zeros((len(world_xy), 1))], 1)
    obs = []
    views = [((-0.25, 0.1, 0.05), (0.02, -0.01, 0.42)),
             ((0.3, 0.15, -0.04), (-0.03, 0.02, 0.38)),
             ((0.05, -0.35, 0.1), (0.01, 0.04, 0.45)),
             ((0.2, 0.3, 0.2), (-0.02, -0.03, 0.36)),
             ((-0.15, -0.2, -0.15), (0.03, 0.01, 0.40))]
    for w, t in views:
        R = np.asarray(se3.exp_so3(jnp.asarray(w)))
        Xc = w3 @ R.T + np.asarray(t)
        px, py = cameras.omni_project(cam, jnp.asarray(Xc))
        obs.append(np.stack([np.asarray(px), np.asarray(py)], 1))
    obs = np.stack(obs) + rng.normal(0, 0.05, (len(views),
                                               len(world_xy), 2))
    res = zhang99.calibrate_mono_omni(world_xy, obs)
    assert res.reprojection_rmse < 0.15, res.reprojection_rmse
    # The UCM has a (f, xi, k1, k2) near-ambiguity: different parameter
    # tuples describe the same pixel<->ray mapping at moderate FOV.  The
    # observable invariant f/(1+xi) must match, and the calibrated
    # camera must reproduce the GT camera's ray directions.
    inv_gt = 260.0 / (1.0 + 0.9)
    inv_est = res.K[0, 0] / (1.0 + res.mirror_offset)
    assert abs(inv_est - inv_gt) < 0.01 * inv_gt, (inv_est, inv_gt)
    est_cam = cameras.CameraUniversalOmni(
        fx=float(res.K[0, 0]), fy=float(res.K[1, 1]),
        cx=float(res.K[0, 2]), cy=float(res.K[1, 2]),
        width=320, height=240, radial=res.radial,
        mirror_offset=res.mirror_offset)
    gx, gy = np.meshgrid(np.linspace(60, 280, 9), np.linspace(40, 200, 7))
    r_gt = np.asarray(cameras.omni_pixel_to_unit(
        cam, jnp.asarray(gx.ravel()), jnp.asarray(gy.ravel())))
    r_est = np.asarray(cameras.omni_pixel_to_unit(
        est_cam, jnp.asarray(gx.ravel()), jnp.asarray(gy.ravel())))
    cosang = np.clip(np.sum(r_gt * r_est, 1), -1, 1)
    max_deg = np.degrees(np.arccos(cosang)).max()
    assert max_deg < 0.2, max_deg
