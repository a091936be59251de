"""SE(3) / SO(3) utilities.

Reference analog: GeoRegression Se3_F64 + boofcv-geo's Rodrigues jacobian
machinery (alg/geo/pose/PnPJacobianRodrigues.java).  Rotations are 3x3
matrices on the outside, so(3) exp/log for optimization steps.  Everything
broadcasts over leading batch dims.
"""

from __future__ import annotations

import jax.numpy as jnp


def hat(w):
    """so(3) hat operator: [..., 3] -> [..., 3, 3]."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([z, -wz, wy], axis=-1),
        jnp.stack([wz, z, -wx], axis=-1),
        jnp.stack([-wy, wx, z], axis=-1),
    ], axis=-2)


def exp_so3(w):
    """Rodrigues' formula: [..., 3] -> [..., 3, 3].

    Written so both branches of every `where` are differentiable at w=0
    (sqrt is only applied to a clamped argument), making jacfwd/jacrev
    through exp at the identity NaN-free — required by the GN refiners.
    """
    t2 = jnp.sum(w * w, axis=-1)[..., None, None]  # [..., 1, 1]
    K = hat(w)
    K2 = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    small = t2 < 1e-14
    t2s = jnp.where(small, 1.0, t2)
    theta = jnp.sqrt(t2s)
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(theta)) / t2s)
    return eye + a * K + b * K2


def log_so3(R):
    """[..., 3, 3] -> [..., 3] axis-angle.

    Three regimes: small angles (series for theta/(2 sin theta)),
    generic, and NEAR PI — where v = vee(R - R^T) = 2 sin(theta) * axis
    vanishes while the generic scale diverges (a plain theta/(2 sin)
    formula returned [0,0,0] at exactly 180 degrees and ~1e10-scale
    garbage at pi - 1e-4).  Near pi the axis is recovered from
    B = (R + I)/2 = axis axis^T + O(pi - theta): the largest column of B
    normalizes to +-axis, and the sign is aligned with v when v is
    nonzero (at exactly pi both signs are equivalent)."""
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    cos_t = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_t)
    v = jnp.stack([R[..., 2, 1] - R[..., 1, 2],
                   R[..., 0, 2] - R[..., 2, 0],
                   R[..., 1, 0] - R[..., 0, 1]], axis=-1)
    small = theta < 1e-7
    near_pi = theta > jnp.pi - 1e-3
    sin_safe = jnp.where(small | near_pi, 1.0, jnp.sin(theta))
    scale = jnp.where(small, 0.5 + theta ** 2 / 12.0,
                      theta / (2.0 * sin_safe))
    w_generic = v * scale[..., None]
    # near-pi branch: the SYMMETRIC part (R + R^T)/2 - cos(theta) I =
    # (1 - cos theta) axis axis^T exactly — symmetrizing removes the
    # O(pi - theta) skew contamination a raw (R + I)/2 column carries
    S = 0.5 * (R + jnp.swapaxes(R, -1, -2)) \
        - cos_t[..., None, None] * jnp.eye(3, dtype=R.dtype)
    diag = jnp.stack([S[..., 0, 0], S[..., 1, 1], S[..., 2, 2]], -1)
    k = jnp.argmax(diag, axis=-1)
    col = jnp.take_along_axis(S, k[..., None, None], axis=-1)[..., 0]
    nrm = jnp.linalg.norm(col, axis=-1, keepdims=True)
    axis = col / jnp.where(nrm < 1e-12, 1.0, nrm)
    sign = jnp.where(jnp.sum(axis * v, axis=-1, keepdims=True) < 0.0,
                     -1.0, 1.0)
    w_pi = theta[..., None] * axis * sign
    return jnp.where(near_pi[..., None], w_pi, w_generic)


def exp_se3(xi):
    """se(3) exp: [..., 6] (w, v ordering: rotation first) -> (R, t)."""
    w = xi[..., :3]
    v = xi[..., 3:]
    R = exp_so3(w)
    t2 = jnp.sum(w * w, axis=-1)[..., None, None]
    K = hat(w)
    K2 = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), K.shape)
    small = t2 < 1e-14
    t2s = jnp.where(small, 1.0, t2)
    theta = jnp.sqrt(t2s)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(theta)) / t2s)
    c = jnp.where(small, 1.0 / 6.0 - t2 / 120.0,
                  (theta - jnp.sin(theta)) / (t2s * theta))
    V = eye + b * K + c * K2
    t = (V @ v[..., None])[..., 0]
    return R, t


def compose(Ra, ta, Rb, tb):
    """(Ra, ta) ∘ (Rb, tb): apply b then a (x -> Ra(Rb x + tb) + ta)."""
    return Ra @ Rb, (Ra @ tb[..., None])[..., 0] + ta


def invert(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ t[..., None])[..., 0]


def transform(R, t, points):
    """Apply SE3 to [..., N, 3] points."""
    return points @ jnp.swapaxes(R, -1, -2) + t[..., None, :]


def rotation_angle(R):
    tr = jnp.trace(R, axis1=-2, axis2=-1)
    return jnp.arccos(jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0))


def project_to_so3(M):
    """Nearest rotation matrix via SVD (sign-corrected)."""
    U, _, Vt = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt)
    D = jnp.stack([jnp.ones_like(det), jnp.ones_like(det), det], axis=-1)
    return (U * D[..., None, :]) @ Vt
