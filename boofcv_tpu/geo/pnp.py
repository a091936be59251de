"""Perspective-n-Point pose estimation.

Reference analog: boofcv-geo alg/geo/pose/ — P3PGrunert.java (closed-form
3-point), PnPLepetitEPnP.java:104 (EPnP), the DLT PnP, and the nonlinear
refiner with Rodrigues jacobians (PnPJacobianRodrigues.java).

TPU design: P3P is the RANSAC minimal solver — written fully batched so K
hypotheses solve as one quartic-root (companion eigenvalue) batch; the
absolute-orientation step (point-cloud alignment) is a batched 3x3 SVD.
The refiner is Gauss-Newton on se(3) with a fixed iteration count
(lax.fori_loop), replacing the reference's ddogleg LM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from boofcv_tpu.geo import se3


def _quartic_roots(c4, c3, c2, c1, c0):
    """Real quartic roots — closed-form Ferrari (TPU has no eigvals/LU;
    see smalllinalg).  Returns (roots [..., 4], real_mask [..., 4])."""
    from boofcv_tpu.geo.smalllinalg import quartic_roots
    return quartic_roots(c4, c3, c2, c1, c0)


def absolute_orientation(world, cam, dtype=jnp.float64):
    """Rigid alignment world->camera minimizing ||R w + t - c|| (batched
    Horn quaternion method; reference: FitSpecialEuclideanOps / the
    alignment inside P3P pose recovery).

    world, cam: [..., N, 3].  Returns (R [..., 3, 3], t [..., 3]).
    Uses eigh of the 4x4 quaternion matrix rather than SVD — eigh is
    implemented on TPU for every float dtype (f32 SVD crashes the TPU
    compiler), and ``dtype=jnp.float32`` makes RANSAC hypothesis
    generation cheap (the winner is re-refined in f64 anyway).
    """
    world = world.astype(dtype)
    cam = cam.astype(dtype)
    wm = jnp.mean(world, axis=-2, keepdims=True)
    cm = jnp.mean(cam, axis=-2, keepdims=True)
    M = jnp.swapaxes(world - wm, -1, -2) @ (cam - cm)  # [..., 3, 3]
    m = lambda i, j: M[..., i, j]
    k0 = m(0, 0) + m(1, 1) + m(2, 2)
    K4 = jnp.stack([
        jnp.stack([k0, m(1, 2) - m(2, 1), m(2, 0) - m(0, 2),
                   m(0, 1) - m(1, 0)], axis=-1),
        jnp.stack([m(1, 2) - m(2, 1), m(0, 0) - m(1, 1) - m(2, 2),
                   m(0, 1) + m(1, 0), m(0, 2) + m(2, 0)], axis=-1),
        jnp.stack([m(2, 0) - m(0, 2), m(0, 1) + m(1, 0),
                   -m(0, 0) + m(1, 1) - m(2, 2), m(1, 2) + m(2, 1)],
                  axis=-1),
        jnp.stack([m(0, 1) - m(1, 0), m(0, 2) + m(2, 0),
                   m(1, 2) + m(2, 1), -m(0, 0) - m(1, 1) + m(2, 2)],
                  axis=-1),
    ], axis=-2)
    _, vecs = jnp.linalg.eigh(K4)
    q = vecs[..., :, -1]                     # max eigenvalue -> quaternion
    w_, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w_),
                   2 * (x * z + y * w_)], axis=-1),
        jnp.stack([2 * (x * y + z * w_), 1 - 2 * (x * x + z * z),
                   2 * (y * z - x * w_)], axis=-1),
        jnp.stack([2 * (x * z - y * w_), 2 * (y * z + x * w_),
                   1 - 2 * (x * x + y * y)], axis=-1),
    ], axis=-2)
    t = cm[..., 0, :] - (R @ wm[..., 0, :, None])[..., 0]
    return R, t


def p3p_grunert(world, obs):
    """Grunert's P3P (P3PGrunert.java), batched over hypotheses.

    world: [..., 3, 3] three 3D points; obs: [..., 3, 2] normalized image
    coords.  Returns (R [..., 4, 3, 3], t [..., 4, 3], valid [..., 4]):
    up to 4 pose solutions per sample (quartic roots), camera-from-world.
    """
    world = world.astype(jnp.float64)
    obs = obs.astype(jnp.float64)
    # unit bearing vectors
    f = jnp.concatenate([obs, jnp.ones_like(obs[..., :1])], axis=-1)
    f = f / jnp.linalg.norm(f, axis=-1, keepdims=True)
    f1, f2, f3 = f[..., 0, :], f[..., 1, :], f[..., 2, :]
    P1, P2, P3 = world[..., 0, :], world[..., 1, :], world[..., 2, :]
    # side lengths
    a = jnp.linalg.norm(P2 - P3, axis=-1)
    b = jnp.linalg.norm(P1 - P3, axis=-1)
    c = jnp.linalg.norm(P1 - P2, axis=-1)
    # angles
    cos_alpha = jnp.sum(f2 * f3, axis=-1)
    cos_beta = jnp.sum(f1 * f3, axis=-1)
    cos_gamma = jnp.sum(f1 * f2, axis=-1)

    a2, b2, c2 = a * a, b * b, c * c
    # Grunert's quartic in v where s2 = u*s1... following the classical
    # derivation (Haralick et al. review of P3P):
    q1 = (a2 - c2) / b2
    q2 = (a2 + c2) / b2
    q3 = (b2 - c2) / b2
    q4 = (b2 - a2) / b2

    A4 = (q1 - 1.0) ** 2 - 4.0 * c2 / b2 * cos_alpha ** 2
    A3 = 4.0 * (q1 * (1.0 - q1) * cos_beta
                - (1.0 - q2) * cos_alpha * cos_gamma
                + 2.0 * c2 / b2 * cos_alpha ** 2 * cos_beta)
    A2 = 2.0 * (q1 ** 2 - 1.0
                + 2.0 * q1 ** 2 * cos_beta ** 2
                + 2.0 * q3 * cos_alpha ** 2
                - 4.0 * q2 * cos_alpha * cos_beta * cos_gamma
                + 2.0 * q4 * cos_gamma ** 2)
    A1 = 4.0 * (-q1 * (1.0 + q1) * cos_beta
                + 2.0 * a2 / b2 * cos_gamma ** 2 * cos_beta
                - (1.0 - q2) * cos_alpha * cos_gamma)
    A0 = (1.0 + q1) ** 2 - 4.0 * a2 / b2 * cos_gamma ** 2

    v, real = _quartic_roots(A4, A3, A2, A1, A0)  # [..., 4]

    # back-substitute: u from v, then s1
    cb = cos_beta[..., None]
    ca = cos_alpha[..., None]
    cg = cos_gamma[..., None]
    q1e = q1[..., None]
    q3e = q3[..., None]
    b2e = b2[..., None]
    a2e = a2[..., None]
    c2e = c2[..., None]
    num = (-1.0 + q1e) * v * v - 2.0 * q1e * cb * v + 1.0 + q1e
    den = 2.0 * (cg - v * ca)
    den = jnp.where(jnp.abs(den) < 1e-30, 1e-30, den)
    u = num / den
    s1sq_den = 1.0 + u * u - 2.0 * u * cg
    s1sq_den = jnp.where(jnp.abs(s1sq_den) < 1e-30, 1e-30, s1sq_den)
    s1 = jnp.sqrt(jnp.maximum(c2e / s1sq_den, 0.0))
    s2 = u * s1
    s3 = v * s1
    ok = real & (s1 > 0) & (s2 > 0) & (s3 > 0)

    # camera-frame points, then absolute orientation per root
    cam1 = s1[..., None] * f1[..., None, :]  # [..., 4, 3]
    cam2 = s2[..., None] * f2[..., None, :]
    cam3 = s3[..., None] * f3[..., None, :]
    cam = jnp.stack([cam1, cam2, cam3], axis=-2)  # [..., 4, 3pts, 3]
    worldr = jnp.broadcast_to(world[..., None, :, :], cam.shape)
    R, t = absolute_orientation(worldr, cam, dtype=jnp.float32)
    return R.astype(jnp.float64), t.astype(jnp.float64), ok


def pnp_dlt(world, obs):
    """DLT PnP for N>=6 points (PoseFromPairLinear6 analog).

    world: [..., N, 3]; obs: [..., N, 2] normalized coords.  Returns
    (R, t) camera-from-world with R projected onto SO(3).
    """
    world = world.astype(jnp.float64)
    obs = obs.astype(jnp.float64)
    X, Y, Z = world[..., 0], world[..., 1], world[..., 2]
    x, y = obs[..., 0], obs[..., 1]
    z = jnp.zeros_like(X)
    o = jnp.ones_like(X)
    r1 = jnp.stack([X, Y, Z, o, z, z, z, z, -x * X, -x * Y, -x * Z, -x], axis=-1)
    r2 = jnp.stack([z, z, z, z, X, Y, Z, o, -y * X, -y * Y, -y * Z, -y], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)  # [..., 2N, 12]
    AtA = jnp.swapaxes(A, -1, -2) @ A
    w, v = jnp.linalg.eigh(AtA)
    p = v[..., :, 0]
    P = p.reshape(p.shape[:-1] + (3, 4))
    # fix sign: points should have positive depth
    Xh = jnp.concatenate([world, jnp.ones_like(world[..., :1])], axis=-1)
    depth = jnp.einsum("...j,...nj->...n", P[..., 2, :], Xh)
    sign = jnp.where(jnp.mean(jnp.sign(depth), axis=-1, keepdims=True) < 0, -1.0, 1.0)
    P = P * sign[..., None]
    M = P[..., :3]
    # scale so that R has unit determinant-ish: use norm of third row
    scale = jnp.linalg.norm(M[..., 2, :], axis=-1)
    M = M / scale[..., None, None]
    t = P[..., 3] / scale[..., None]
    R = se3.project_to_so3(M)
    return R, t


def epnp(world, obs, refine_iterations: int = 10):
    """EPnP (PnPLepetitEPnP.java:104 analog): O(N) PnP via 4 control
    points.

    world: [N, 3], obs: [N, 2] normalized coords.  The 12x12 normal
    matrix of the control-point system is eigendecomposed; the null-space
    dimension-1 and -2 cases are solved from the inter-control-point
    distance constraints and the better (by reprojection) seeds a GN
    polish — the reference's relinearization step is replaced by the same
    full GN refine it applies afterwards anyway.  Returns (R, t).
    """
    world = world.astype(jnp.float64)
    obs = obs.astype(jnp.float64)
    n = world.shape[0]

    # control points: centroid + principal axes (Lepetit eq. 2 choice)
    c0 = jnp.mean(world, axis=0)
    dev = world - c0
    cov = dev.T @ dev / n
    w_eig, v_eig = jnp.linalg.eigh(cov)
    scale = jnp.sqrt(jnp.maximum(w_eig, 1e-12))
    ctrl = jnp.concatenate([c0[None],
                            c0[None] + (v_eig * scale[None, :]).T], axis=0)

    # barycentric coordinates: [4] per point with sum = 1
    Cmat = jnp.concatenate([ctrl.T, jnp.ones((1, 4), jnp.float64)], axis=0)
    rhs = jnp.concatenate([world.T, jnp.ones((1, n), jnp.float64)], axis=0)
    alpha = jnp.linalg.solve(Cmat, rhs).T                   # [N, 4]

    # M x = 0 with x = camera coords of the 4 control points (12 vector)
    u = obs[:, 0]
    v = obs[:, 1]
    zero = jnp.zeros_like(alpha)
    row_x = jnp.stack([alpha, zero, -alpha * u[:, None]],
                      axis=-1).reshape(n, 12)
    row_y = jnp.stack([zero, alpha, -alpha * v[:, None]],
                      axis=-1).reshape(n, 12)
    M = jnp.concatenate([row_x, row_y], axis=0)             # [2N, 12]
    MtM = M.T @ M
    _, V = jnp.linalg.eigh(MtM)
    v1 = V[:, 0].reshape(4, 3)
    v2 = V[:, 1].reshape(4, 3)

    iu, ju = jnp.triu_indices(4, k=1)
    dw = jnp.linalg.norm(ctrl[iu] - ctrl[ju], axis=1)       # [6] world dists

    def pose_from_ctrl(cc):
        """Camera control points -> (R, t) with cheirality fix."""
        cam = alpha @ cc
        sign = jnp.where(jnp.mean(cam[:, 2]) < 0, -1.0, 1.0)
        return absolute_orientation(world, cam * sign)

    # case N=1: x = beta v1, beta from matching distances
    d1 = jnp.linalg.norm(v1[iu] - v1[ju], axis=1)
    beta1 = jnp.sum(d1 * dw) / jnp.maximum(jnp.sum(d1 * d1), 1e-30)
    Ra, ta = pose_from_ctrl(beta1 * v1)

    # case N=2: x = b1 v1 + b2 v2; 6 distance constraints linear in
    # (b1^2, b1 b2, b2^2)
    e1 = v1[iu] - v1[ju]
    e2 = v2[iu] - v2[ju]
    L = jnp.stack([jnp.sum(e1 * e1, 1), 2 * jnp.sum(e1 * e2, 1),
                   jnp.sum(e2 * e2, 1)], axis=1)            # [6, 3]
    bb = jnp.linalg.lstsq(L, dw * dw)[0]
    b1 = jnp.sqrt(jnp.maximum(bb[0], 1e-30))
    b2 = jnp.sign(bb[1]) * jnp.sqrt(jnp.maximum(bb[2], 0.0))
    Rb, tb = pose_from_ctrl(b1 * v1 + b2 * v2)

    err_a = jnp.sum(jnp.where(jnp.isfinite(
        reprojection_error_sq(Ra, ta, world, obs)),
        reprojection_error_sq(Ra, ta, world, obs), 1e12))
    err_b = jnp.sum(jnp.where(jnp.isfinite(
        reprojection_error_sq(Rb, tb, world, obs)),
        reprojection_error_sq(Rb, tb, world, obs), 1e12))
    better = err_a <= err_b
    R = jnp.where(better, Ra, Rb)
    t = jnp.where(better, ta, tb)
    if refine_iterations > 0:
        R, t = gauss_newton_pose(R, t, world, obs,
                                 iterations=refine_iterations)
    return R, t


def pnp_planar(world_xy, obs, refine_iterations: int = 10):
    """Planar PnP (IPPE use-case, alg/geo/pose/IPPE_to_EstimatePnP /
    Zhang99DecomposeHomography analog): pose from N>=4 coplanar points.

    world_xy: [N, 2] plane coordinates (world z = 0); obs: [N, 2]
    normalized image coords.  The plane->image homography H = [r1 r2 t]
    is decomposed directly (no K: obs are normalized) and polished with
    the same GN refine the reference's IPPE wrapper applies.  Returns
    (R, t) camera-from-world.
    """
    from boofcv_tpu.geo.epipolar import homography_dlt
    world_xy = world_xy.astype(jnp.float64)
    obs = obs.astype(jnp.float64)
    H = homography_dlt(world_xy, obs)
    s = 1.0 / jnp.linalg.norm(H[:, 0])
    s = jnp.where(H[2, 2] * s < 0, -s, s)   # points must sit in front
    r1 = H[:, 0] * s
    r2 = H[:, 1] * s
    r3 = jnp.cross(r1, r2)
    t = H[:, 2] * s
    R = se3.project_to_so3(jnp.stack([r1, r2, r3], axis=1))
    world3 = jnp.concatenate([world_xy, jnp.zeros_like(world_xy[:, :1])], 1)
    return refine_pnp(R, t, world3, obs, iterations=refine_iterations)


def reprojection_error_sq(R, t, world, obs):
    """Squared reprojection error in normalized image coords, batched.

    R: [..., 3, 3], t: [..., 3], world: [..., N, 3], obs: [..., N, 2].
    Returns [..., N].  (PnPDistanceReprojectionSq analog; behind-camera
    points get +inf as the reference marks them unusable.)
    """
    Xc = world @ jnp.swapaxes(R, -1, -2) + t[..., None, :]
    zc = Xc[..., 2]
    proj = Xc[..., :2] / jnp.where(jnp.abs(zc) < 1e-12, 1e-12, zc)[..., None]
    err = jnp.sum((proj - obs) ** 2, axis=-1)
    return jnp.where(zc <= 0, jnp.inf, err)


def gauss_newton_pose(R, t, world, obs, weights=None, iterations: int = 10,
                      damping: float = 1e-8):
    """Weighted GN pose refinement with the ANALYTIC reprojection
    Jacobian (left-perturbation: Xc' = exp(w)Xc + v, so
    dXc/d(w,v) = [-hat(Xc) | I] and dproj/dXc is the standard pinhole
    2x3) — one residual pass per iteration instead of jacfwd's six
    tangent passes, which matters on TPU where f64 is emulated.
    """
    world = world.astype(jnp.float64)
    obs = obs.astype(jnp.float64)
    if weights is None:
        weights = jnp.ones(world.shape[:-1], jnp.float64)
    wgt = weights.astype(jnp.float64)

    def body(_, state):
        R0, t0 = state
        Xc = world @ R0.T + t0
        z = jnp.where(jnp.abs(Xc[..., 2]) < 1e-12, 1e-12, Xc[..., 2])
        inv_z = 1.0 / z
        x = Xc[..., 0] * inv_z
        y = Xc[..., 1] * inv_z
        r = jnp.stack([x, y], -1) - obs                    # [N, 2]
        # J = dproj/dXc @ [-hat(Xc) | I]  -> [N, 2, 6]
        zeros = jnp.zeros_like(inv_z)
        # dproj/dXc rows [1/z, 0, -x/z], [0, 1/z, -y/z]; rotation block
        # dproj/dw = dproj/dXc @ (-hat(Xc)) in closed form:
        jw_x = jnp.stack([-x * y, 1.0 + x * x, -y], -1)    # d x / dw
        jw_y = jnp.stack([-(1.0 + y * y), x * y, x], -1)   # d y / dw
        jv_x = jnp.stack([inv_z, zeros, -x * inv_z], -1)
        jv_y = jnp.stack([zeros, inv_z, -y * inv_z], -1)
        Jx = jnp.concatenate([jw_x, jv_x], -1)             # [N, 6]
        Jy = jnp.concatenate([jw_y, jv_y], -1)
        J = jnp.stack([Jx, Jy], 1)                         # [N, 2, 6]
        w2 = wgt[:, None]
        H = jnp.einsum("nij,nik->jk", J * w2[..., None], J,
                       precision=jax.lax.Precision.HIGHEST)
        g = jnp.einsum("nij,ni->j", J, r * w2,
                       precision=jax.lax.Precision.HIGHEST)
        H = H + damping * jnp.eye(6, dtype=jnp.float64)
        L6 = jnp.linalg.cholesky(H)
        y6 = jax.scipy.linalg.solve_triangular(L6, g, lower=True)
        dx = -jax.scipy.linalg.solve_triangular(L6.T, y6, lower=False)
        dR, dt = se3.exp_se3(dx)
        Rn, tn = se3.compose(dR, dt, R0, t0)
        return Rn, tn, jnp.max(jnp.abs(dx))

    # early exit once the step stalls: GN on reprojection converges
    # quadratically, typically 3-4 iterations — f64 iterations are
    # expensive on TPU (emulated), so don't run the fixed max
    def cond(state):
        it, _, _, step = state
        return (it < iterations) & (step > 1e-14)

    def wbody(state):
        it, R0, t0, _ = state
        Rn, tn, step = body(it, (R0, t0))
        return it + 1, Rn, tn, step

    _, R, t, _ = jax.lax.while_loop(
        cond, wbody, (jnp.int32(0), R.astype(jnp.float64),
                      t.astype(jnp.float64), jnp.float64(1.0)))
    return R, t


def refine_pnp(R, t, world, obs, iterations: int = 10, damping: float = 1e-8):
    """Gauss-Newton refinement of (R, t) minimizing reprojection error.

    Replaces the reference's ddogleg LM refiner (PnPRefineRodrigues).
    world: [N, 3], obs: [N, 2] normalized coords.  Runs a fixed number of
    iterations (static shape); each iteration is one 6x6 solve.
    """
    return gauss_newton_pose(R, t, world, obs, iterations=iterations,
                             damping=damping)
