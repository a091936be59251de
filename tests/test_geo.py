"""Synthetic-geometry oracle tests (SURVEY §4.4: random 3D scenes + known
cameras; estimators must recover ground truth)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from boofcv_tpu.geo import se3, epipolar, triangulate, pnp, robust


def make_scene(rng, n=50, noise=0.0):
    """Random 3D points seen by two cameras; returns GT + normalized obs."""
    pts = np.stack([
        rng.uniform(-1, 1, n), rng.uniform(-1, 1, n), rng.uniform(2, 5, n)
    ], axis=1)
    w = rng.normal(0, 0.05, 3)
    R = np.asarray(se3.exp_so3(jnp.asarray(w)))
    t = np.array([0.3, -0.1, 0.05])
    p1 = pts[:, :2] / pts[:, 2:3]
    pc2 = pts @ R.T + t
    p2 = pc2[:, :2] / pc2[:, 2:3]
    if noise:
        p1 = p1 + rng.normal(0, noise, p1.shape)
        p2 = p2 + rng.normal(0, noise, p2.shape)
    return pts, R, t, p1, p2


def essential_from_rt(R, t):
    tx = np.asarray(se3.hat(jnp.asarray(t)))
    return tx @ R


def test_so3_exp_log_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.normal(0, 1, (10, 3))
    R = se3.exp_so3(jnp.asarray(w))
    w2 = se3.log_so3(R)
    np.testing.assert_allclose(np.asarray(w2), w, atol=1e-8)


def test_se3_exp_compose_invert():
    rng = np.random.default_rng(1)
    xi = jnp.asarray(rng.normal(0, 0.5, 6))
    R, t = se3.exp_se3(xi)
    Ri, ti = se3.invert(R, t)
    Rc, tc = se3.compose(R, t, Ri, ti)
    np.testing.assert_allclose(np.asarray(Rc), np.eye(3), atol=1e-10)
    np.testing.assert_allclose(np.asarray(tc), 0, atol=1e-10)


def test_fundamental_8pt_epipolar_constraint():
    rng = np.random.default_rng(2)
    pts, R, t, p1, p2 = make_scene(rng, 30)
    F = epipolar.fundamental_8pt(jnp.asarray(p1), jnp.asarray(p2))
    err = epipolar.epipolar_constraint(F, jnp.asarray(p1), jnp.asarray(p2))
    assert float(jnp.max(err)) < 1e-8
    # rank 2
    s = jnp.linalg.svd(F, compute_uv=False)
    assert float(s[2]) < 1e-10


def test_fundamental_7pt_contains_truth():
    rng = np.random.default_rng(3)
    pts, R, t, p1, p2 = make_scene(rng, 7)
    F3, real = epipolar.fundamental_7pt(jnp.asarray(p1), jnp.asarray(p2))
    errs = []
    for i in range(3):
        if bool(real[i]):
            e = epipolar.epipolar_constraint(F3[i], jnp.asarray(p1), jnp.asarray(p2))
            errs.append(float(jnp.max(e)))
    assert errs and min(errs) < 1e-8


def test_essential_decompose_recovers_pose():
    rng = np.random.default_rng(4)
    pts, R, t, p1, p2 = make_scene(rng, 40)
    E = epipolar.essential_8pt(jnp.asarray(p1), jnp.asarray(p2))
    R4, t4 = epipolar.decompose_essential(E)
    Rb, tb, _ = epipolar.select_pose_cheirality(R4, t4, jnp.asarray(p1), jnp.asarray(p2))
    np.testing.assert_allclose(np.asarray(Rb), R, atol=1e-6)
    tn = np.asarray(tb) / np.linalg.norm(np.asarray(tb))
    tgt = t / np.linalg.norm(t)
    np.testing.assert_allclose(np.abs(tn @ tgt), 1.0, atol=1e-6)


def test_homography_dlt_on_plane():
    rng = np.random.default_rng(5)
    # planar scene z = 3
    n = 20
    pts = np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n), np.full(n, 3.0)], 1)
    w = rng.normal(0, 0.1, 3)
    R = np.asarray(se3.exp_so3(jnp.asarray(w)))
    t = np.array([0.2, 0.1, -0.1])
    p1 = pts[:, :2] / pts[:, 2:3]
    pc2 = pts @ R.T + t
    p2 = pc2[:, :2] / pc2[:, 2:3]
    H = epipolar.homography_dlt(jnp.asarray(p1), jnp.asarray(p2))
    err = epipolar.homography_transfer_error(H, jnp.asarray(p1), jnp.asarray(p2))
    assert float(jnp.max(err)) < 1e-10


def test_triangulate_linear_and_midpoint():
    rng = np.random.default_rng(6)
    pts, R, t, p1, p2 = make_scene(rng, 25)
    Xl = triangulate.triangulate_two_view_linear(
        jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(R), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(Xl), pts, atol=1e-6)
    Xm = triangulate.triangulate_two_view_midpoint(
        jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(R), jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(Xm), pts, atol=1e-6)


def test_triangulate_nview():
    rng = np.random.default_rng(7)
    n, v = 15, 4
    pts = np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                    rng.uniform(2, 5, n)], 1)
    Rs, ts, obs = [], [], []
    for i in range(v):
        w = rng.normal(0, 0.05, 3)
        R = np.asarray(se3.exp_so3(jnp.asarray(w)))
        t = rng.normal(0, 0.2, 3)
        pc = pts @ R.T + t
        obs.append(pc[:, :2] / pc[:, 2:3])
        Rs.append(R)
        ts.append(t)
    X = triangulate.triangulate_nview_linear(
        jnp.asarray(np.stack(obs)), jnp.asarray(np.stack(Rs)), jnp.asarray(np.stack(ts)))
    np.testing.assert_allclose(np.asarray(X), pts, atol=1e-6)


def test_p3p_grunert_contains_truth():
    rng = np.random.default_rng(8)
    pts, R, t, p1, p2 = make_scene(rng, 3)
    R4, t4, ok = pnp.p3p_grunert(jnp.asarray(pts), jnp.asarray(p2))
    best = np.inf
    for i in range(4):
        if bool(ok[i]):
            dr = np.abs(np.asarray(R4[i]) - R).max()
            dt = np.abs(np.asarray(t4[i]) - t).max()
            best = min(best, max(dr, dt))
    assert best < 1e-6


def test_pnp_dlt_and_refine():
    rng = np.random.default_rng(9)
    pts, R, t, p1, p2 = make_scene(rng, 30, noise=1e-4)
    Re, te = pnp.pnp_dlt(jnp.asarray(pts), jnp.asarray(p2))
    assert np.abs(np.asarray(Re) - R).max() < 5e-3
    Rr, tr = pnp.refine_pnp(Re, te, jnp.asarray(pts), jnp.asarray(p2))
    # refined should beat linear
    err_lin = float(jnp.mean(pnp.reprojection_error_sq(
        Re, te, jnp.asarray(pts), jnp.asarray(p2))))
    err_ref = float(jnp.mean(pnp.reprojection_error_sq(
        Rr, tr, jnp.asarray(pts), jnp.asarray(p2))))
    assert err_ref <= err_lin
    assert np.abs(np.asarray(Rr) - R).max() < 1e-3


def test_ransac_fundamental_with_outliers():
    rng = np.random.default_rng(10)
    pts, R, t, p1, p2 = make_scene(rng, 80, noise=1e-4)
    # corrupt 30%
    n_out = 24
    p2c = p2.copy()
    p2c[:n_out] += rng.uniform(0.05, 0.2, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    key = jax.random.PRNGKey(0)
    res = robust.ransac_fundamental(key, jnp.asarray(p1), jnp.asarray(p2c),
                                    num_hypotheses=256,
                                    inlier_threshold_px=1e-3)
    inl = np.asarray(res.inliers)
    assert inl[n_out:].mean() > 0.95      # finds the good ones
    assert inl[:n_out].mean() < 0.2       # rejects most outliers


def test_ransac_pnp_with_outliers():
    rng = np.random.default_rng(11)
    pts, R, t, p1, p2 = make_scene(rng, 100, noise=1e-4)
    n_out = 30
    p2c = p2.copy()
    p2c[:n_out] += rng.uniform(0.05, 0.2, (n_out, 2)) * rng.choice([-1, 1], (n_out, 2))
    key = jax.random.PRNGKey(1)
    res, (Rr, tr) = robust.ransac_pnp(key, jnp.asarray(pts), jnp.asarray(p2c),
                                      num_hypotheses=256, inlier_threshold=1e-5)
    assert np.abs(np.asarray(Rr) - R).max() < 1e-3
    assert np.abs(np.asarray(tr) - t).max() < 1e-3
    inl = np.asarray(res.inliers)
    assert inl[n_out:].mean() > 0.95


def test_ransac_homography():
    rng = np.random.default_rng(12)
    n = 60
    pts = np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n), np.full(n, 3.0)], 1)
    w = rng.normal(0, 0.1, 3)
    R = np.asarray(se3.exp_so3(jnp.asarray(w)))
    t = np.array([0.2, 0.1, -0.1])
    p1 = pts[:, :2] / pts[:, 2:3]
    pc2 = pts @ R.T + t
    p2 = pc2[:, :2] / pc2[:, 2:3]
    p2c = p2.copy()
    p2c[:15] += 0.1
    res = robust.ransac_homography(jax.random.PRNGKey(2), jnp.asarray(p1),
                                   jnp.asarray(p2c), num_hypotheses=256,
                                   inlier_threshold_px=1e-3)
    inl = np.asarray(res.inliers)
    assert inl[15:].mean() > 0.95 and inl[:15].mean() < 0.2


def test_lmeds_fundamental():
    rng = np.random.default_rng(13)
    pts, R, t, p1, p2 = make_scene(rng, 60, noise=1e-5)
    p2c = p2.copy()
    p2c[:10] += 0.1
    from boofcv_tpu.geo import epipolar as ep

    def solver(sample):
        s1, s2 = sample
        return ep.fundamental_8pt(s1, s2)

    def scorer(F, points):
        q1, q2 = points
        return ep.sampson_error(F, q1.astype(jnp.float64), q2.astype(jnp.float64))

    res = robust.least_median_of_squares(
        jax.random.PRNGKey(3), (jnp.asarray(p1), jnp.asarray(p2c)),
        solver, scorer, sample_size=8, num_hypotheses=256)
    inl = np.asarray(res.inliers)
    assert inl[10:].mean() > 0.9


def test_omni_camera_roundtrip():
    from boofcv_tpu.geo import cameras
    cam = cameras.CameraUniversalOmni(
        fx=300.0, fy=305.0, cx=320.0, cy=240.0, radial=(0.05, -0.01),
        t1=1e-3, t2=-5e-4, mirror_offset=0.8)
    rng = np.random.default_rng(4)
    # rays over a wide FOV (including z near 0 — beyond pinhole range)
    X = rng.uniform(-1, 1, (200, 3))
    X[:, 2] = rng.uniform(0.15, 2.0, 200)
    X = jnp.asarray(X)
    px, py = cameras.omni_project(cam, X)
    S = cameras.omni_pixel_to_unit(cam, px, py)
    Xn = X / jnp.linalg.norm(X, axis=-1, keepdims=True)
    assert float(jnp.abs(S - Xn).max()) < 1e-6
    # unit norm
    assert float(jnp.abs(jnp.linalg.norm(S, axis=-1) - 1).max()) < 1e-9


def test_omni_reduces_to_pinhole_at_zero_offset():
    from boofcv_tpu.geo import cameras
    base = dict(fx=300.0, fy=300.0, cx=320.0, cy=240.0)
    omni = cameras.CameraUniversalOmni(**base, mirror_offset=0.0)
    pin = cameras.CameraPinholeBrown(**base)
    X = jnp.asarray([[0.2, -0.1, 2.0], [0.5, 0.4, 1.0]])
    pxo, pyo = cameras.omni_project(omni, X)
    pxp, pyp = cameras.project(pin, X)
    assert float(jnp.abs(pxo - pxp).max()) < 1e-9
    assert float(jnp.abs(pyo - pyp).max()) < 1e-9


def test_pnp_planar_recovers_pose():
    from boofcv_tpu.geo import pnp, se3
    rng = np.random.default_rng(5)
    world_xy = jnp.asarray(rng.uniform(-1, 1, (24, 2)))
    Rgt = np.asarray(se3.exp_so3(jnp.asarray([0.2, -0.3, 0.1])))
    tgt = np.array([0.1, -0.2, 3.0])
    w3 = np.concatenate([np.asarray(world_xy), np.zeros((24, 1))], 1)
    Xc = w3 @ Rgt.T + tgt
    obs = jnp.asarray(Xc[:, :2] / Xc[:, 2:])
    R, t = pnp.pnp_planar(world_xy, obs)
    assert np.abs(np.asarray(R) - Rgt).max() < 1e-8
    assert np.abs(np.asarray(t) - tgt).max() < 1e-8


def test_epnp_recovers_pose():
    from boofcv_tpu.geo import pnp, se3
    rng = np.random.default_rng(6)
    world = jnp.asarray(np.concatenate(
        [rng.uniform(-2, 2, (40, 2)), rng.uniform(3, 9, (40, 1))], 1))
    Rgt = np.asarray(se3.exp_so3(jnp.asarray([0.3, -0.2, 0.15])))
    tgt = np.array([0.2, -0.4, 1.0])
    Xc = np.asarray(world) @ Rgt.T + tgt
    obs = jnp.asarray(Xc[:, :2] / Xc[:, 2:])
    R, t = pnp.epnp(world, obs)
    assert np.abs(np.asarray(R) - Rgt).max() < 1e-8
    assert np.abs(np.asarray(t) - tgt).max() < 1e-8
    # without the GN polish the linear solution must already be close
    R0, t0 = pnp.epnp(world, obs, refine_iterations=0)
    assert np.abs(np.asarray(R0) - Rgt).max() < 1e-2


def test_p3p_finsterwalder_contains_truth():
    from boofcv_tpu.geo import pnp, se3
    rng = np.random.default_rng(9)
    hits = 0
    for _ in range(12):
        world = jnp.asarray(np.concatenate(
            [rng.uniform(-2, 2, (3, 2)), rng.uniform(3, 9, (3, 1))], 1))
        Rgt = np.asarray(se3.exp_so3(jnp.asarray(rng.normal(0, 0.3, 3))))
        tgt = rng.normal(0, 0.5, 3)
        tgt[2] = abs(tgt[2]) + 0.5
        Xc = np.asarray(world) @ Rgt.T + tgt
        if (Xc[:, 2] <= 0.1).any():
            continue
        obs = jnp.asarray(Xc[:, :2] / Xc[:, 2:])
        R4, t4, ok = pnp.p3p_finsterwalder(world, obs)
        best = min((np.abs(np.asarray(R4[i]) - Rgt).max()
                    for i in range(4) if bool(ok[i])), default=np.inf)
        assert best < 1e-5, best
        hits += 1
    assert hits >= 8


def test_p3p_finsterwalder_batched():
    import jax
    from boofcv_tpu.geo import pnp, se3
    rng = np.random.default_rng(10)
    K = 16
    world = jnp.asarray(np.concatenate(
        [rng.uniform(-2, 2, (K, 3, 2)), rng.uniform(3, 9, (K, 3, 1))], 2))
    R = np.asarray(se3.exp_so3(jnp.asarray([0.1, 0.2, -0.1])))
    t = np.array([0.1, -0.2, 0.6])
    Xc = np.asarray(world) @ R.T + t
    obs = jnp.asarray(Xc[..., :2] / Xc[..., 2:])
    R4, t4, ok = jax.vmap(pnp.p3p_finsterwalder)(world, obs)
    assert R4.shape == (K, 4, 3, 3)
    found = 0
    for k in range(K):
        errs = [np.abs(np.asarray(R4[k, i]) - R).max()
                for i in range(4) if bool(ok[k, i])]
        if errs and min(errs) < 1e-5:
            found += 1
    assert found >= K - 2, found


def test_ransac_pnp_finsterwalder_variant():
    import jax
    rng = np.random.default_rng(12)
    w = jnp.asarray(np.concatenate(
        [rng.uniform(-1, 1, (64, 2)), rng.uniform(4, 8, (64, 1))], 1))
    obs = np.array(w[:, :2] / w[:, 2:])
    obs[:10] += 0.05
    res, (R, t) = robust.ransac_pnp(
        jax.random.PRNGKey(2), w, jnp.asarray(obs), num_hypotheses=128,
        inlier_threshold=1e-5, p3p="finsterwalder")
    assert int(res.num_inliers) >= 50
    assert np.abs(np.asarray(R) - np.eye(3)).max() < 1e-6
    assert np.abs(np.asarray(t)).max() < 1e-6


def test_essential_nister5_recovers_truth():
    rng = np.random.default_rng(11)
    for _ in range(4):
        pts, R, t, p1, p2 = make_scene(rng, 5)
        E_true = essential_from_rt(R, t)
        E_true = E_true / np.linalg.norm(E_true)
        E, valid = epipolar.essential_nister5(jnp.asarray(p1), jnp.asarray(p2))
        E = np.asarray(E)
        errs = [min(np.linalg.norm(e - E_true), np.linalg.norm(e + E_true))
                for e, v in zip(E, np.asarray(valid)) if v]
        assert errs and min(errs) < 1e-8


def test_essential_nister5_batched():
    rng = np.random.default_rng(12)
    samples1, samples2, Es = [], [], []
    for _ in range(6):
        pts, R, t, p1, p2 = make_scene(rng, 5)
        samples1.append(p1)
        samples2.append(p2)
        e = essential_from_rt(R, t)
        Es.append(e / np.linalg.norm(e))
    E, valid = epipolar.essential_nister5(
        jnp.asarray(np.stack(samples1)), jnp.asarray(np.stack(samples2)))
    E = np.asarray(E)
    valid = np.asarray(valid)
    for k in range(6):
        errs = [min(np.linalg.norm(e - Es[k]), np.linalg.norm(e + Es[k]))
                for e, v in zip(E[k], valid[k]) if v]
        assert errs and min(errs) < 1e-7


def test_ransac_essential_nister_outliers():
    rng = np.random.default_rng(13)
    pts, R, t, p1, p2 = make_scene(rng, 80, noise=1e-4)
    # corrupt 40% of matches
    bad = rng.random(80) < 0.4
    p2 = p2.copy()
    p2[bad] += rng.uniform(0.05, 0.3, size=(bad.sum(), 2))
    res = robust.ransac_essential(
        jax.random.PRNGKey(0), jnp.asarray(p1), jnp.asarray(p2),
        num_hypotheses=64, inlier_threshold=1e-5)
    inl = np.asarray(res.inliers)
    # all true inliers kept, nearly no outliers admitted
    assert inl[~bad].mean() > 0.95
    assert inl[bad].mean() < 0.1
