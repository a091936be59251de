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


def test_cameras_from_fundamental_consistent():
    from boofcv_tpu.geo import epipolar as ep
    rng = np.random.default_rng(3)
    X = np.concatenate([rng.uniform(-1, 1, (40, 2)),
                        rng.uniform(4, 7, (40, 1))], 1)
    R = np.asarray(se3.exp_so3(jnp.asarray([0.05, -0.1, 0.02])))
    t = np.array([0.4, 0.05, 0.1])
    p1 = X[:, :2] / X[:, 2:]
    Xc = X @ R.T + t
    p2 = Xc[:, :2] / Xc[:, 2:]
    F = ep.fundamental_8pt(jnp.asarray(p1), jnp.asarray(p2))
    e1, e2 = ep.epipoles_from_fundamental(F)
    # epipoles satisfy F e1 = 0 and e2^T F = 0
    assert np.abs(np.asarray(F) @ np.asarray(e1)).max() < 1e-8
    assert np.abs(np.asarray(e2) @ np.asarray(F)).max() < 1e-8
    # canonical camera pair reproduces F up to scale:
    # F' = [e2]x P2[:, :3] should match (both from the same epipolar geom)
    P1, P2 = ep.cameras_from_fundamental(F)
    # verify projective consistency: for triangulated points the
    # epipolar constraint p2' F p1 ~ 0 holds for reprojections
    from boofcv_tpu.geo import triangulate as tri
    # DLT triangulation in the projective frame
    for i in range(5):
        A = np.zeros((4, 4))
        A[0] = p1[i, 0] * np.asarray(P1)[2] - np.asarray(P1)[0]
        A[1] = p1[i, 1] * np.asarray(P1)[2] - np.asarray(P1)[1]
        A[2] = p2[i, 0] * np.asarray(P2)[2] - np.asarray(P2)[0]
        A[3] = p2[i, 1] * np.asarray(P2)[2] - np.asarray(P2)[1]
        _, _, Vt = np.linalg.svd(A)
        Xp = Vt[-1]
        r1 = np.asarray(P1) @ Xp
        r2 = np.asarray(P2) @ Xp
        assert np.abs(r1[:2] / r1[2] - p1[i]).max() < 1e-6
        assert np.abs(r2[:2] / r2[2] - p2[i]).max() < 1e-6


def test_projective_factorization_reprojects():
    from boofcv_tpu.geo import selfcalib
    rng = np.random.default_rng(4)
    N, V = 30, 4
    X = np.concatenate([rng.uniform(-1, 1, (N, 2)),
                        rng.uniform(5, 8, (N, 1))], 1)
    obs = []
    for v in range(V):
        R = np.asarray(se3.exp_so3(jnp.asarray(rng.normal(0, 0.05, 3))))
        t = np.array([0.3 * v, 0.0, 0.0])
        Xc = X @ R.T + t
        obs.append(Xc[:, :2] / Xc[:, 2:])
    obs = jnp.asarray(np.stack(obs))
    Ps, Xh = selfcalib.projective_structure_factorization(obs)
    proj = np.einsum("vij,nj->vni", np.asarray(Ps), np.asarray(Xh))
    reproj = proj[..., :2] / proj[..., 2:]
    # plain Sturm-Triggs (like the reference's fixed-sweep version)
    # converges to a near-exact fixed point, not machine precision
    err = np.abs(reproj - np.asarray(obs)).max()
    assert err < 5e-3, err


def test_guess_and_check_focus():
    from boofcv_tpu.geo import selfcalib
    rng = np.random.default_rng(7)
    f = 0.9
    K = np.diag([f, f, 1.0])
    Ps_m = []
    for v in range(4):
        R = np.asarray(se3.exp_so3(jnp.asarray(rng.normal(0, 0.1, 3)))) \
            if v else np.eye(3)
        t = np.array([0.4 * v, 0.02 * v, 0.1 * v])
        Ps_m.append(K @ np.concatenate([R, t[:, None]], 1))
    # warp into an arbitrary projective frame keeping P1 = [I | 0]
    w = rng.normal(0, 0.3, 3)
    G = np.eye(4)
    G[:3, :3] = np.linalg.inv(K)
    G[3, :3] = w
    Ps = np.stack([P @ G for P in Ps_m])
    assert np.abs(Ps[0] - np.concatenate(
        [np.eye(3), np.zeros((3, 1))], 1)).max() < 1e-12
    f_est, H = selfcalib.guess_and_check_focus(
        Ps, focal_candidates=np.geomspace(0.4, 2.0, 60))
    assert abs(f_est - f) / f < 0.06, f_est
    # H rectifies: P2 H ~ K [R | t] -> (K^-1 P2 H)[:, :3] ~ rotation
    A = np.linalg.inv(np.diag([f_est, f_est, 1.0])) @ Ps[1] @ H
    A = A / np.cbrt(abs(np.linalg.det(A[:, :3])))
    RtR = A[:, :3] @ A[:, :3].T
    assert np.abs(RtR - np.eye(3)).max() < 0.15, RtR


def test_associate_mutual_2d_gate():
    import jax.numpy as jnp2
    from boofcv_tpu.feature import associate
    # identical descriptors, disambiguated only by the position gate
    desc = jnp2.asarray(np.tile(np.eye(4, 8), (1, 1)), jnp2.float32)
    xy_a = jnp2.asarray([[0.0, 0], [100, 0], [200, 0], [300, 0]])
    xy_b = xy_a + 3.0
    s = associate.score_euclidean_sq(desc, desc)
    m = associate.associate_mutual_2d(s, xy_a, xy_b, max_distance=10.0)
    assert bool(m.valid.all())
    assert (np.asarray(m.dst) == np.arange(4)).all()
    m2 = associate.associate_mutual_2d(s, xy_a, xy_b, max_distance=1.0)
    assert not bool(m2.valid.any())


def test_trifocal_algebraic_refine_improves_noisy_linear():
    """With observation noise the linear 7-pt solution violates the
    internal tensor constraints; algebraic refinement onto the valid
    manifold must not increase — and typically reduces — the transfer
    error (TrifocalAlgebraicPoint7.java:48 oracle)."""
    rng = np.random.default_rng(5)
    pts, cams, obs = three_view_scene(rng, n=15)
    noisy = [o + rng.normal(0, 5e-4, o.shape) for o in obs]
    T_lin = trifocal.trifocal_linear(*[jnp.asarray(o) for o in noisy])
    T_ref = trifocal.trifocal_algebraic_refine(
        T_lin, *[jnp.asarray(o) for o in noisy])
    # evaluate against the NOISE-FREE observations
    clean = [jnp.asarray(o) for o in obs]
    e_lin = float(np.sqrt(np.asarray(trifocal.transfer_error(T_lin, *clean)).mean()))
    e_ref = float(np.sqrt(np.asarray(trifocal.transfer_error(T_ref, *clean)).mean()))
    assert e_ref < e_lin * 1.05
    assert e_ref < 5e-3


def test_trifocal_algebraic_refine_exact_fixed_point():
    """Noise-free data: refinement starting from the linear estimate must
    keep a (near-)exact tensor."""
    rng = np.random.default_rng(6)
    pts, cams, obs = three_view_scene(rng, n=12)
    clean = [jnp.asarray(o) for o in obs]
    T_lin = trifocal.trifocal_linear(*clean)
    T_ref = trifocal.trifocal_algebraic_refine(T_lin, *clean, iterations=5)
    err = np.asarray(trifocal.transfer_error(T_ref, *clean))
    assert np.sqrt(err.mean()) < 1e-6
