"""Self-calibration and projective-to-metric upgrades.

Reference analog: boofcv-geo/boofcv-calibration alg/geo/selfcalib/ —
SelfCalibrationLinearDualQuadratic.java (linear dual absolute quadric
from projective cameras), DecomposeAbsoluteDualQuadratic.java, plus
alg/geo/h/HomographyDecomposition (decomposeHomography) and
alg/geo/structure/ProjectiveStructureByFactorization.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def homography_decompose(H, K1=None, K2=None):
    """Decompose a metric homography H = R + t n^T / d into candidate
    (R, t/d, n) solutions (Faugeras SVD method;
    HomographyDecomposition analog).

    H maps normalized coords view1 -> view2 (pass K matrices to
    un-calibrate a pixel homography).  Returns list of (R, t, n) — up to
    4 physically distinct solutions.
    """
    H = np.asarray(H, np.float64)
    if K1 is not None:
        H = np.linalg.inv(np.asarray(K2, np.float64)) @ H @ np.asarray(K1, np.float64)
    U, S, Vt = np.linalg.svd(H)
    H = H / S[1]
    U, S, Vt = np.linalg.svd(H)
    s = np.linalg.det(U) * np.linalg.det(Vt)
    d1, d2, d3 = S
    if abs(d1 - d3) < 1e-9:   # pure rotation
        return [(H, np.zeros(3), np.array([0.0, 0, 1]))]
    x1 = np.sqrt(max((d1 ** 2 - d2 ** 2) / (d1 ** 2 - d3 ** 2), 0.0))
    x3 = np.sqrt(max((d2 ** 2 - d3 ** 2) / (d1 ** 2 - d3 ** 2), 0.0))
    sols = []
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            n_p = np.array([e1 * x1, 0.0, e3 * x3])
            sin_t = e1 * e3 * x1 * x3 * (d1 - d3) / d2
            cos_t = (d2 ** 2 + d1 * d3) / ((d1 + d3) * d2)
            Rp = np.array([[cos_t, 0, -sin_t], [0, 1, 0], [sin_t, 0, cos_t]])
            tp = (d1 - d3) * np.array([e1 * x1, 0.0, -e3 * x3])
            R = s * U @ Rp @ Vt
            t = U @ tp
            n = Vt.T @ n_p
            if n[2] < 0:
                n = -n
                t = -t
            sols.append((R, t, n))
    return sols


def self_calibrate_dual_quadratic(Ps, zero_skew: bool = True,
                                  known_aspect: bool = True,
                                  principal_at_origin: bool = True):
    """Linear self-calibration from >=3 projective cameras
    (SelfCalibrationLinearDualQuadratic).

    Ps: [V, 3, 4] projective cameras consistent with one projective frame
    (P1 = [I|0] recommended, cameras normalized so pixels are centered:
    this implementation assumes principal point ~ 0 as the reference's
    linear variant does).  Returns (K, rectifying H [4, 4]) such that
    P_metric = P H.
    """
    Ps = np.asarray(Ps, np.float64)
    V = Ps.shape[0]
    # unknowns: Q* (4x4 symmetric, 10 params).  Constraints from
    # w = P Q* P^T: zero skew w01=0; unit aspect w00=w11;
    # principal point w02=w12=0
    def q_coeffs(P, i, j):
        """Row expressing w_ij as linear comb of the 10 Q params."""
        # Q indices (a<=b): order (00,01,02,03,11,12,13,22,23,33)
        idx = [(0, 0), (0, 1), (0, 2), (0, 3), (1, 1), (1, 2), (1, 3),
               (2, 2), (2, 3), (3, 3)]
        row = np.zeros(10)
        for n, (a, b) in enumerate(idx):
            v = P[i, a] * P[j, b] + (P[i, b] * P[j, a] if a != b else 0.0)
            row[n] = v
        return row

    rows = []
    for v in range(V):
        P = Ps[v]
        if zero_skew:
            rows.append(q_coeffs(P, 0, 1))
        if principal_at_origin:
            rows.append(q_coeffs(P, 0, 2))
            rows.append(q_coeffs(P, 1, 2))
        if known_aspect:
            rows.append(q_coeffs(P, 0, 0) - q_coeffs(P, 1, 1))
    A = np.stack(rows)
    _, _, Vt = np.linalg.svd(A)
    q = Vt[-1]
    idx = [(0, 0), (0, 1), (0, 2), (0, 3), (1, 1), (1, 2), (1, 3),
           (2, 2), (2, 3), (3, 3)]
    Q = np.zeros((4, 4))
    for n, (a, b) in enumerate(idx):
        Q[a, b] = q[n]
        Q[b, a] = q[n]
    # sign: make Q PSD-ish (rank 3)
    w, v = np.linalg.eigh(Q)
    if w.sum() < 0:
        Q = -Q
        w, v = np.linalg.eigh(Q)
    # decompose (DecomposeAbsoluteDualQuadratic): Q* = H diag(1,1,1,0) H^T
    order = np.argsort(w)[::-1]
    w = w[order]
    v = v[:, order]
    w3 = np.clip(w[:3], 1e-12, None)
    H = v[:, :4].copy()
    H[:, :3] = v[:, :3] * np.sqrt(w3)
    H[:, 3] = v[:, 3]
    # K of camera 0 from w0 = P0 Q* P0^T
    w0 = Ps[0] @ Q @ Ps[0].T
    w0 = w0 / w0[2, 2]
    # K via w = K K^T with K UPPER triangular: Cholesky of the inverse
    # (the transpose trick; a direct lower Cholesky of w0 was dead code
    # that could raise LinAlgError on an indefinite w0 before this path)
    Winv = np.linalg.inv((w0 + w0.T) / 2.0 + 1e-12 * np.eye(3))
    L = np.linalg.cholesky(Winv)
    K = np.linalg.inv(L.T)
    K = K / K[2, 2]
    return K, H


def projective_structure_factorization(obs, iterations: int = 10):
    """Projective structure from factorization (Sturm-Triggs;
    alg/geo/structure/ProjectiveStructureByFactorization.java).

    obs: [V, N, 2] pixel/normalized observations of N points in V views
    (all points visible in all views, as the reference requires).
    Iterates: build the depth-scaled [3V, N] measurement matrix, rank-4
    SVD factorization into cameras [V, 3, 4] and homogeneous points
    [N, 4], re-estimate projective depths, repeat — all dense linear
    algebra, batched on device.

    Returns (Ps [V, 3, 4], X [N, 4]) up to a common projective transform.
    """
    import jax.numpy as _jnp
    obs = _jnp.asarray(obs, _jnp.float64)
    V, N = obs.shape[0], obs.shape[1]
    # Hartley-style normalization per view for conditioning
    mean = _jnp.mean(obs, axis=1, keepdims=True)
    scale = _jnp.mean(_jnp.linalg.norm(obs - mean, axis=-1),
                      axis=1)[:, None, None] / _jnp.sqrt(2.0)
    scale = _jnp.where(scale < 1e-12, 1.0, scale)
    on = (obs - mean) / scale
    hom = _jnp.concatenate([on, _jnp.ones_like(on[..., :1])], -1)  # [V,N,3]

    lam = _jnp.ones((V, N), _jnp.float64)
    Ps = Xh = None
    for _ in range(iterations):
        # balance depths (row/column normalization, as Sturm-Triggs)
        lam = lam / _jnp.linalg.norm(lam, axis=1, keepdims=True)
        lam = lam / _jnp.linalg.norm(lam, axis=0, keepdims=True)
        M = (lam[..., None] * hom).transpose(0, 2, 1).reshape(3 * V, N)
        U, s, Vt = _jnp.linalg.svd(M, full_matrices=False)
        Ps = (U[:, :4] * s[:4]).reshape(V, 3, 4)
        Xh = Vt[:4].T                                     # [N, 4]
        proj = _jnp.einsum("vij,nj->vni", Ps, Xh)
        lam = proj[..., 2]
    # un-normalize cameras: x = (x_n * scale + mean)
    T = _jnp.zeros((V, 3, 3), _jnp.float64)
    T = T.at[:, 0, 0].set(scale[:, 0, 0])
    T = T.at[:, 1, 1].set(scale[:, 0, 0])
    T = T.at[:, 0, 2].set(mean[:, 0, 0])
    T = T.at[:, 1, 2].set(mean[:, 0, 1])
    T = T.at[:, 2, 2].set(1.0)
    Ps = _jnp.einsum("vij,vjk->vik", T, Ps)
    return Ps, Xh


def guess_and_check_focus(Ps, focal_candidates=None,
                          principal_at_origin: bool = True):
    """Brute-force focal-length self-calibration
    (SelfCalibrationGuessAndCheckFocus analog): for each candidate focal
    length (shared across views, principal point at origin), rectify the
    projective cameras with the implied plane at infinity and score how
    closely every rectified camera's K K^T matches the hypothesis; the
    best-scoring focal wins.

    Ps: [V, 3, 4] projective cameras with P1 = [I | 0].  Returns
    (f_best, H [4, 4]) with P_metric = P H.
    """
    Ps = np.asarray(Ps, np.float64)
    if focal_candidates is None:
        focal_candidates = np.geomspace(0.3, 3.0, 40)  # in normalized units

    best = (np.inf, None, None)
    for f in focal_candidates:
        K = np.diag([f, f, 1.0])
        # plane at infinity from the dual quadratic constraint: with
        # P1 = [I|0] and w1 = K K^T, Q* = [[w1, -w1 p], [-p^T w1, p^T w1 p]]
        # solve for p by minimizing the constraint violation on the other
        # views (linear least squares on w_i ~ P_i Q* P_i^T).
        w1 = K @ K.T
        # parameterize Q*(p) linear in p; build residuals for views 2..V
        def q_of(p):
            top = np.concatenate([w1, -(w1 @ p)[:, None]], axis=1)
            bot = np.concatenate([-(w1 @ p)[None, :],
                                  [[float(p @ w1 @ p)]]], axis=1)
            return np.concatenate([top, bot], axis=0)

        # coarse inner search for p (3 params) by Gauss-Newton from 0
        p = np.zeros(3)
        for _ in range(10):
            def resid(pv):
                Q = q_of(pv)
                r = []
                for i in range(1, Ps.shape[0]):
                    wi = Ps[i] @ Q @ Ps[i].T
                    wi = wi / np.linalg.norm(wi)
                    tgt = w1 / np.linalg.norm(w1)
                    r.append((wi - tgt).ravel())
                return np.concatenate(r)

            r0 = resid(p)
            J = np.zeros((r0.size, 3))
            eps = 1e-6
            for k in range(3):
                dp = np.zeros(3)
                dp[k] = eps
                J[:, k] = (resid(p + dp) - r0) / eps
            try:
                dp = np.linalg.lstsq(J, -r0, rcond=None)[0]
            except np.linalg.LinAlgError:
                break
            p = p + dp
            if np.linalg.norm(dp) < 1e-12:
                break
        score = float(np.sum(resid(p) ** 2)) if Ps.shape[0] > 1 else 0.0
        if score < best[0]:
            best = (score, float(f), p.copy())

    _, f_best, p = best
    K = np.diag([f_best, f_best, 1.0])
    H = np.eye(4)
    H[:3, :3] = K
    H[3, :3] = -p @ K
    return f_best, H
