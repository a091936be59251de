"""Epipolar geometry: Fundamental / Essential / Homography estimation.

Reference analog: boofcv-geo alg/geo/f/ (FundamentalLinear8.java,
FundamentalLinear7.java, EssentialNister5.java), alg/geo/h/
(HomographyDirectLinearTransform.java), and the residuals in
alg/geo/f/FundamentalResidualSampson.java / DistanceEpipolarConstraint.

TPU design: every solver is written over a *batch* of minimal sample sets
(leading axis = RANSAC hypotheses), so K hypotheses are solved as one
batched SVD/eig — the hypothesis-parallel RANSAC sweet spot (SURVEY §2.4
"robust estimation glue").  All solvers run in f64 (conditioning), points
are Hartley-normalized internally as in the reference's
LowLevelMultiViewOps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_points(pts):
    """Hartley normalization: [..., N, 2] -> (normed, T [3,3]).

    T maps raw pixels to zero-mean, sqrt(2)-mean-radius coordinates
    (LowLevelMultiViewOps.computeNormalization).
    """
    pts = pts.astype(jnp.float64)
    mean = jnp.mean(pts, axis=-2, keepdims=True)
    centered = pts - mean
    # reference uses per-axis stdev normalization
    std = jnp.std(centered, axis=-2, keepdims=True) + 1e-12
    normed = centered / std
    sx = 1.0 / std[..., 0, 0]
    sy = 1.0 / std[..., 0, 1]
    cx = mean[..., 0, 0]
    cy = mean[..., 0, 1]
    z = jnp.zeros_like(sx)
    o = jnp.ones_like(sx)
    T = jnp.stack([
        jnp.stack([sx, z, -sx * cx], axis=-1),
        jnp.stack([z, sy, -sy * cy], axis=-1),
        jnp.stack([z, z, o], axis=-1),
    ], axis=-2)
    return normed, T


def _epipolar_design(p1, p2):
    """Rows x2^T F x1 = 0: [..., N, 9] for F in row-major flatten order."""
    x1, y1 = p1[..., 0], p1[..., 1]
    x2, y2 = p2[..., 0], p2[..., 1]
    o = jnp.ones_like(x1)
    return jnp.stack([x2 * x1, x2 * y1, x2,
                      y2 * x1, y2 * y1, y2,
                      x1, y1, o], axis=-1)


def _smallest_singular_vector(A):
    """Right singular vector of least singular value: [..., M, 9] -> [..., 9].

    Uses eigh of A^T A (symmetric 9x9) — batched, TPU-friendly, f64.
    """
    AtA = jnp.swapaxes(A, -1, -2) @ A
    w, v = jnp.linalg.eigh(AtA)
    return v[..., :, 0]  # eigh sorts ascending


def _nullspace2(A):
    """Two right singular vectors of the two smallest singular values."""
    AtA = jnp.swapaxes(A, -1, -2) @ A
    w, v = jnp.linalg.eigh(AtA)
    return v[..., :, 0], v[..., :, 1]


def fundamental_8pt(p1, p2, weights=None):
    """Normalized 8-point fundamental matrix (FundamentalLinear8.java).

    p1, p2: [..., N>=8, 2] pixel coords.  Returns [..., 3, 3] with rank-2
    constraint enforced, denormalized, scaled so ||F||=1.  ``weights``
    ([..., N], e.g. an inlier mask) scales the design rows — used for the
    local-optimization refit after RANSAC.
    """
    n1, T1 = normalize_points(p1)
    n2, T2 = normalize_points(p2)
    A = _epipolar_design(n1, n2)
    if weights is not None:
        A = A * weights.astype(A.dtype)[..., None]
    f = _smallest_singular_vector(A)
    F = f.reshape(f.shape[:-1] + (3, 3))
    # enforce rank 2
    U, s, Vt = jnp.linalg.svd(F)
    s = s.at[..., 2].set(0.0)
    F = (U * s[..., None, :]) @ Vt
    F = jnp.swapaxes(T2, -1, -2) @ F @ T1
    norm = jnp.linalg.norm(F, axis=(-2, -1), keepdims=True)
    return F / jnp.where(norm == 0, 1.0, norm)


def _cubic_roots(a3, a2, a1, a0):
    """Real cubic roots — closed-form Cardano (TPU has no eigvals/LU;
    see smalllinalg).  Returns (roots [..., 3], real_mask [..., 3])."""
    from boofcv_tpu.geo.smalllinalg import cubic_roots
    return cubic_roots(a3, a2, a1, a0)


def fundamental_7pt(p1, p2):
    """7-point fundamental (FundamentalLinear7.java): up to 3 solutions.

    p1, p2: [..., 7, 2].  Returns (F [..., 3, 3, 3], valid [..., 3]) — the
    three candidate matrices with a validity mask (cubic real roots).
    """
    n1, T1 = normalize_points(p1)
    n2, T2 = normalize_points(p2)
    A = _epipolar_design(n1, n2)
    f1, f2 = _nullspace2(A)
    F1 = f1.reshape(f1.shape[:-1] + (3, 3))
    F2 = f2.reshape(f2.shape[:-1] + (3, 3))

    # det(a*F1 + (1-a)*F2) = 0 -> cubic in a.  Build coefficients by
    # evaluating the determinant at 4 points and interpolating (numerically
    # stable and avoids symbolic expansion).
    def det_at(t):
        return jnp.linalg.det(t * F1 + (1.0 - t) * F2)

    d0 = det_at(0.0)
    d1 = det_at(1.0)
    dm = det_at(-1.0)
    d2 = det_at(2.0)
    # p(t)=c3 t^3+c2 t^2+c1 t+c0 with p(0)=d0,p(1)=d1,p(-1)=dm,p(2)=d2
    c0 = d0
    c2 = (d1 + dm) / 2.0 - d0
    c3 = (d2 - 2.0 * d1 + 2.0 * dm - d0 - 6.0 * c2) / 6.0
    c1 = d1 - d0 - c2 - c3
    roots, real = _cubic_roots(c3, c2, c1, c0)

    a = roots[..., :, None, None]  # [..., 3, 1, 1]
    F = a * F1[..., None, :, :] + (1.0 - a) * F2[..., None, :, :]
    F = jnp.swapaxes(T2, -1, -2)[..., None, :, :] @ F @ T1[..., None, :, :]
    norm = jnp.linalg.norm(F, axis=(-2, -1), keepdims=True)
    F = F / jnp.where(norm == 0, 1.0, norm)
    return F, real


def essential_8pt(p1, p2, weights=None):
    """Essential matrix from >=8 *normalized image coords* via the linear
    solver + projection onto the essential manifold (sigma=(1,1,0)).

    The reference exposes Nister-5pt for minimal sets; for hypothesis-
    parallel RANSAC an 8-point minimal set with exact manifold projection
    is equally usable and far more TPU-regular.  p1, p2: [..., N>=8, 2]
    in normalized (K^-1) coordinates.  ``weights`` scales design rows
    (inlier-mask refits).
    """
    A = _epipolar_design(p1.astype(jnp.float64), p2.astype(jnp.float64))
    if weights is not None:
        A = A * weights.astype(A.dtype)[..., None]
    e = _smallest_singular_vector(A)
    E = e.reshape(e.shape[:-1] + (3, 3))
    U, s, Vt = jnp.linalg.svd(E)
    sm = (s[..., 0] + s[..., 1]) * 0.5
    s_new = jnp.stack([sm, sm, jnp.zeros_like(sm)], axis=-1)
    return (U * s_new[..., None, :]) @ Vt


def sampson_error(F, p1, p2):
    """First-order geometric (Sampson) distance^2 per point.

    F: [..., 3, 3]; p1, p2: [..., N, 2].  Returns [..., N]
    (FundamentalResidualSampson.java).
    """
    ones = jnp.ones_like(p1[..., :1])
    x1 = jnp.concatenate([p1, ones], axis=-1)
    x2 = jnp.concatenate([p2, jnp.ones_like(p2[..., :1])], axis=-1)
    Fx1 = x1 @ jnp.swapaxes(F, -1, -2)   # [..., N, 3] = (F @ x1)
    Ftx2 = x2 @ F                          # [..., N, 3] = (F^T @ x2)
    num = jnp.sum(x2 * Fx1, axis=-1) ** 2
    den = Fx1[..., 0] ** 2 + Fx1[..., 1] ** 2 + Ftx2[..., 0] ** 2 + Ftx2[..., 1] ** 2
    return num / jnp.maximum(den, 1e-30)


def epipolar_constraint(F, p1, p2):
    """|x2^T F x1| per point (DistanceEpipolarConstraint)."""
    ones = jnp.ones_like(p1[..., :1])
    x1 = jnp.concatenate([p1, ones], axis=-1)
    x2 = jnp.concatenate([p2, jnp.ones_like(p2[..., :1])], axis=-1)
    Fx1 = x1 @ jnp.swapaxes(F, -1, -2)
    return jnp.abs(jnp.sum(x2 * Fx1, axis=-1))


def homography_dlt(p1, p2):
    """N>=4-point homography DLT (HomographyDirectLinearTransform.java).

    p1, p2: [..., N, 2]; returns [..., 3, 3] with H[2,2] ~ 1 scaling.
    """
    n1, T1 = normalize_points(p1)
    n2, T2 = normalize_points(p2)
    x, y = n1[..., 0], n1[..., 1]
    u, v = n2[..., 0], n2[..., 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    r1 = jnp.stack([-x, -y, -o, z, z, z, u * x, u * y, u], axis=-1)
    r2 = jnp.stack([z, z, z, -x, -y, -o, v * x, v * y, v], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)
    h = _smallest_singular_vector(A)
    H = h.reshape(h.shape[:-1] + (3, 3))
    from boofcv_tpu.geo.smalllinalg import inv3
    H = inv3(T2) @ H @ T1
    scale = H[..., 2:3, 2:3]
    return H / jnp.where(jnp.abs(scale) < 1e-12, 1.0, scale)


def homography_transfer_error(H, p1, p2):
    """Symmetric-ish forward transfer error^2 per point."""
    ones = jnp.ones_like(p1[..., :1])
    x1 = jnp.concatenate([p1, ones], axis=-1)
    Hx = x1 @ jnp.swapaxes(H, -1, -2)
    w = Hx[..., 2]
    proj = Hx[..., :2] / jnp.where(jnp.abs(w) < 1e-12, 1.0, w)[..., None]
    return jnp.sum((proj - p2) ** 2, axis=-1)


def essential_from_fundamental(F, K1, K2):
    """E = K2^T F K1 (MultiViewOps)."""
    return jnp.swapaxes(K2, -1, -2) @ F @ K1


def fundamental_from_essential(E, K1, K2):
    from boofcv_tpu.geo.smalllinalg import inv3
    return inv3(jnp.swapaxes(K2, -1, -2)) @ E @ inv3(K1)


def decompose_essential(E):
    """E -> 4 candidate (R, t) (DecomposeEssential.java).

    Returns R: [..., 4, 3, 3], t: [..., 4, 3] (unit translation).
    """
    U, s, Vt = jnp.linalg.svd(E)
    # make proper rotations
    detU = jnp.linalg.det(U)
    detV = jnp.linalg.det(jnp.swapaxes(Vt, -1, -2))
    U = U * jnp.where(detU < 0, -1.0, 1.0)[..., None, None]
    Vt = Vt * jnp.where(detV < 0, -1.0, 1.0)[..., None, None]
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]],
                  dtype=E.dtype)
    Ra = U @ W @ Vt
    Rb = U @ W.T @ Vt
    t = U[..., :, 2]
    R4 = jnp.stack([Ra, Ra, Rb, Rb], axis=-3)
    t4 = jnp.stack([t, -t, t, -t], axis=-2)
    return R4, t4


def select_pose_cheirality(R4, t4, p1, p2):
    """Pick the (R, t) with most points in front of both cameras.

    p1, p2: [N, 2] normalized coords.  Returns (R [3,3], t [3], best_idx).
    Uses the midpoint-free linear two-view triangulation per candidate.
    """
    from boofcv_tpu.geo.triangulate import triangulate_two_view_linear

    def count(R, t):
        X = triangulate_two_view_linear(p1, p2, R, t)
        z1 = X[..., 2]
        X2 = X @ jnp.swapaxes(R, -1, -2) + t
        z2 = X2[..., 2]
        return jnp.sum((z1 > 0) & (z2 > 0), axis=-1)

    counts = jax.vmap(count, in_axes=(0, 0))(R4, t4) if R4.ndim == 3 else \
        jax.vmap(count, in_axes=(-3, -2))(R4, t4)
    best = jnp.argmax(counts)
    return R4[best], t4[best], best


def epipoles_from_fundamental(F):
    """Left/right epipoles (null vectors of F / F^T): F e1 = 0,
    F^T e2 = 0 (MultiViewOps.extractEpipoles analog).  Returns
    (e1 [3], e2 [3]) homogeneous."""
    F = F.astype(jnp.float64)
    _, _, Vt = jnp.linalg.svd(F)
    e1 = Vt[-1]
    _, _, Vt2 = jnp.linalg.svd(F.T)
    e2 = Vt2[-1]
    return e1, e2


def cameras_from_fundamental(F):
    """Canonical projective camera pair from F
    (MultiViewOps.fundamentalToProjective / F->P):
    P1 = [I | 0], P2 = [[e2]x F | e2].  Returns (P1 [3,4], P2 [3,4])."""
    F = F.astype(jnp.float64)
    _, e2 = epipoles_from_fundamental(F)
    ex = jnp.array([[0.0, -e2[2], e2[1]],
                    [e2[2], 0.0, -e2[0]],
                    [-e2[1], e2[0], 0.0]], jnp.float64)
    P1 = jnp.concatenate([jnp.eye(3, dtype=jnp.float64),
                          jnp.zeros((3, 1), jnp.float64)], axis=1)
    P2 = jnp.concatenate([ex @ F, e2[:, None]], axis=1)
    return P1, P2
