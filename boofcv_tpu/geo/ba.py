"""Bundle adjustment: block-sparse Levenberg-Marquardt with Schur complement.

Reference analog: boofcv-geo abst/geo/bundle/ + alg/geo/bundle/ —
SceneStructureMetric.java:37 / SceneObservations.java (problem structs),
BundleAdjustmentMetricResidualFunction.java (residuals),
BundleAdjustmentMetricSchurJacobian.java:42,231 (Schur-ordered sparse
jacobian), BundleAdjustmentSchur.java:33,87 driving ddogleg's
UnconstrainedLeastSquaresSchur.  The reference delegates the sparse
LM-Schur solve to ddogleg; **this module owns the solver** (SURVEY §3.3).

TPU design (SURVEY §7 stage 4):
* Observations live in a dense ``[P, L]`` layout — every point has up to L
  observation slots (view index + pixel + valid mask).  Static shapes,
  perfect for vmap/segment ops, and shardable over the point axis.
* Per-point 3x3 Hessian blocks are batch-inverted; the reduced camera
  system S (``[6V, 6V]`` dense — fine for sliding windows and scenes up
  to ~1k views on one chip) is assembled with one einsum over observation
  pairs + a scatter-add, then solved with Cholesky.
* The LM loop runs a fixed number of outer iterations under jit; step
  acceptance is branchless (jnp.where), lambda updates multiplicative —
  same trust-region flavor as ddogleg's LevenbergMarquardt_F64.
* View 0 (or any mask) is gauge-fixed by zeroing its update rows.

Camera models: 'normalized' (observations are K^-1 pixels, no intrinsics
optimized) and 'snavely' (BAL convention: f, k1, k2 per view, z<0 looks
forward) for Bundle-Adjustment-in-the-Large interop
(io/geo/CodecBundleAdjustmentInTheLarge.java).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from boofcv_tpu.geo import se3


class BAProblem(NamedTuple):
    """Scene structure + observations (SceneStructureMetric/SceneObservations).

    R: [V, 3, 3], t: [V, 3] — world->view transforms.
    intr: [V, K] per-view intrinsics (K=0 for 'normalized', 3 for 'snavely').
    points: [P, 3] world points.
    obs_xy: [P, L, 2]; obs_view: [P, L] int32; obs_valid: [P, L] bool.
    fixed_views: [V] bool — gauge-fixed views (updates zeroed).
    """
    R: jnp.ndarray
    t: jnp.ndarray
    intr: jnp.ndarray
    points: jnp.ndarray
    obs_xy: jnp.ndarray
    obs_view: jnp.ndarray
    obs_valid: jnp.ndarray
    fixed_views: jnp.ndarray
    model: str = "normalized"


def _project(model: str, Xc, intr):
    """Camera-frame point -> 2D observation. Xc: [..., 3], intr: [..., K]."""
    if model == "normalized":
        z = Xc[..., 2]
        zs = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
        return Xc[..., :2] / zs[..., None]
    if model == "snavely":
        # BAL: p = -X/X.z; r = 1 + k1|p|^2 + k2|p|^4; proj = f * r * p
        z = Xc[..., 2]
        zs = jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
        p = -Xc[..., :2] / zs[..., None]
        f, k1, k2 = intr[..., 0], intr[..., 1], intr[..., 2]
        r2 = jnp.sum(p * p, axis=-1)
        distort = 1.0 + k1 * r2 + k2 * r2 * r2
        return (f * distort)[..., None] * p
    raise ValueError(f"unknown camera model {model!r}")


def n_intr(model: str) -> int:
    return {"normalized": 0, "snavely": 3}[model]


def residuals(prob: BAProblem):
    """[P, L, 2] residuals (proj - obs), zeroed where invalid."""
    R_o = prob.R[prob.obs_view]        # [P, L, 3, 3]
    t_o = prob.t[prob.obs_view]        # [P, L, 3]
    intr_o = prob.intr[prob.obs_view]  # [P, L, K]
    Xc = jnp.einsum("plij,pj->pli", R_o, prob.points) + t_o
    proj = _project(prob.model, Xc, intr_o)
    r = proj - prob.obs_xy
    return jnp.where(prob.obs_valid[..., None], r, 0.0)


def cost(prob: BAProblem):
    r = residuals(prob)
    return 0.5 * jnp.sum(r * r)


def _obs_residual(model, R, t, intr, X, xy):
    """Single-observation residual as a function of local (xi, dX, dintr)."""
    def f(xi, dX, dintr):
        dR, dt = se3.exp_se3(xi)
        Rc, tc = se3.compose(dR, dt, R, t)
        Xc = Rc @ (X + dX) + tc
        return _project(model, Xc, intr + dintr) - xy
    return f


def _jacobians(prob: BAProblem):
    """Per-observation jacobians at the current state.

    Returns Jv [P, L, 2, D] (D = 6 + n_intr), Jp [P, L, 2, 3], r [P, L, 2].
    """
    k = n_intr(prob.model)
    d = 6 + k
    model = prob.model

    def one(R, t, intr, X, xy):
        f = _obs_residual(model, R, t, intr, X, xy)
        xi0 = jnp.zeros((6,), jnp.float64)
        dX0 = jnp.zeros((3,), jnp.float64)
        di0 = jnp.zeros((max(k, 1),), jnp.float64)[:k] if k else jnp.zeros((0,), jnp.float64)
        r = f(xi0, dX0, di0)
        Jxi, JX, Ji = jax.jacfwd(f, argnums=(0, 1, 2))(xi0, dX0, di0)
        Jv = jnp.concatenate([Jxi, Ji], axis=-1) if k else Jxi
        return Jv, JX, r

    R_o = prob.R[prob.obs_view]
    t_o = prob.t[prob.obs_view]
    intr_o = prob.intr[prob.obs_view]
    Xb = jnp.broadcast_to(prob.points[:, None, :], prob.obs_xy.shape[:2] + (3,))
    Jv, Jp, r = jax.vmap(jax.vmap(one))(
        R_o, t_o, intr_o, Xb.astype(jnp.float64), prob.obs_xy.astype(jnp.float64))
    valid = prob.obs_valid[..., None, None]
    Jv = jnp.where(valid, Jv, 0.0)
    Jp = jnp.where(valid, Jp, 0.0)
    r = jnp.where(prob.obs_valid[..., None], r, 0.0)
    return Jv, Jp, r


def _local_system(obs_view, Jv, Jp, r, lam, num_views: int):
    """Per-point-shard contributions to the reduced camera system.

    Pure function of a (possibly sharded) slice of the point axis — the
    distributed BA psums its outputs (S_partial, gv_t_partial) across
    shards (SURVEY §2.9 "NEW: model/spatial parallel").

    Returns (S_partial [V, V, D, D] incl. Hvv on the diagonal,
    gv_t_partial [V, D], Hpp_inv [P, 3, 3], W [P, L, 3, D], gp [P, 3]).
    """
    P, L = obs_view.shape
    V = num_views
    D = Jv.shape[-1]

    Hpp = jnp.einsum("plki,plkj->pij", Jp, Jp)              # [P, 3, 3]
    W = jnp.einsum("plki,plkj->plij", Jp, Jv)                # [P, L, 3, D]
    gp = -jnp.einsum("plki,plk->pi", Jp, r)                  # [P, 3]
    gv_obs = -jnp.einsum("plki,plk->pli", Jv, r)             # [P, L, D]

    from boofcv_tpu.geo.smalllinalg import inv3
    eyeP = jnp.eye(3, dtype=Hpp.dtype)
    Hpp_inv = inv3(Hpp + (lam + 1e-12) * eyeP)

    Hvv_obs = jnp.einsum("plki,plkj->plij", Jv, Jv)          # [P, L, D, D]
    flat_view = obs_view.reshape(-1)
    Hvv = jnp.zeros((V, D, D), Hpp.dtype).at[flat_view].add(
        Hvv_obs.reshape(-1, D, D))
    gv = jnp.zeros((V, D), Hpp.dtype).at[flat_view].add(
        gv_obs.reshape(-1, D))

    # Schur fill-in: -sum_p sum_{l1,l2} W^T Hpp^-1 W scattered to [vi, vj]
    Y = jnp.einsum("pij,pljk->plik", Hpp_inv, W)             # [P, L, 3, D]
    pair = jnp.einsum("plik,pmij->plmkj", W, Y)              # [P, L, L, D, D]
    vi = jnp.broadcast_to(obs_view[:, :, None], (P, L, L))
    vj = jnp.broadcast_to(obs_view[:, None, :], (P, L, L))
    flat_idx = (vi * V + vj).reshape(-1)
    S = jnp.zeros((V * V, D, D), Hpp.dtype).at[flat_idx].add(
        pair.reshape(-1, D, D))
    S = -S.reshape(V, V, D, D)
    S = S.at[jnp.arange(V), jnp.arange(V)].add(Hvv)

    # reduced rhs partial: gv - sum W^T Hpp_inv gp
    hp = jnp.einsum("pij,pj->pi", Hpp_inv, gp)               # [P, 3]
    corr = jnp.einsum("plij,pi->plj", W, hp)                 # [P, L, D]
    gv_t = gv - jnp.zeros((V, D), Hpp.dtype).at[flat_view].add(
        corr.reshape(-1, D))
    return S, gv_t, Hpp_inv, W, gp


def _solve_reduced(S, gv_t, fixed_views, lam):
    """Damp + gauge-fix the (already psummed) reduced system and solve.

    Returns delta_view [V, D].
    """
    V, _, D, _ = S.shape
    S = S.at[jnp.arange(V), jnp.arange(V)].add(
        lam * jnp.eye(D, dtype=S.dtype))

    # gauge fixing: zero rows/cols of fixed views' POSE block only
    # (intrinsics of a gauge-fixed view must stay free — they carry no
    # gauge freedom), identity on the frozen diagonal entries.
    pose_col = (jnp.arange(D) < 6).astype(S.dtype)           # [D]
    frozen = fixed_views.astype(S.dtype)[:, None] * pose_col[None, :]
    free_vd = 1.0 - frozen                                   # [V, D]
    S = S * free_vd[:, None, :, None] * free_vd[None, :, None, :]
    S = S.at[jnp.arange(V), jnp.arange(V)].add(
        jax.vmap(jnp.diag)(frozen))
    gv_t = gv_t * free_vd

    Sd = S.transpose(0, 2, 1, 3).reshape(V * D, V * D)
    gd = gv_t.reshape(V * D)
    # TPU-supported f64 path: Cholesky + triangular solves (LU is not
    # implemented on TPU; cholesky/eigh/svd are)
    L_chol = jnp.linalg.cholesky(Sd)
    y = jax.scipy.linalg.solve_triangular(L_chol, gd, lower=True)
    dv = jax.scipy.linalg.solve_triangular(
        L_chol.T, y, lower=False).reshape(V, D)
    return dv * free_vd


def _back_substitute(obs_view, Hpp_inv, W, gp, dv):
    """Point updates given the view step: dp = Hpp^-1 (gp - sum_l W dv)."""
    dv_obs = dv[obs_view]                                    # [P, L, D]
    corr_p = jnp.einsum("plij,plj->pi", W, dv_obs)
    return jnp.einsum("pij,pj->pi", Hpp_inv, gp - corr_p)


def _schur_solve(prob: BAProblem, Jv, Jp, r, lam):
    """One damped Schur-complement solve (single-device path).

    Returns (delta_view [V, D], delta_point [P, 3]).
    """
    V = prob.R.shape[0]
    S, gv_t, Hpp_inv, W, gp = _local_system(
        prob.obs_view, Jv, Jp, r, lam, V)
    dv = _solve_reduced(S, gv_t, prob.fixed_views, lam)
    dp = _back_substitute(prob.obs_view, Hpp_inv, W, gp, dv)
    return dv, dp


def _apply_step(prob: BAProblem, dv, dp):
    k = n_intr(prob.model)
    xi = dv[:, :6]
    dR, dt = jax.vmap(se3.exp_se3)(xi)
    Rn, tn = jax.vmap(se3.compose)(dR, dt, prob.R, prob.t)
    intr_n = prob.intr + dv[:, 6:6 + k] if k else prob.intr
    return prob._replace(R=Rn, t=tn, intr=intr_n, points=prob.points + dp)


def optimize(prob: BAProblem, iterations: int = 20, lam0: float = 1e-3,
             lam_up: float = 10.0, lam_down: float = 0.3):
    """LM-Schur bundle adjustment (BundleAdjustmentSchur.optimize:87 analog).

    Fixed iteration count, branchless accept/reject.  Returns
    (optimized problem, info dict of per-iteration costs).
    """
    prob = prob._replace(
        R=prob.R.astype(jnp.float64), t=prob.t.astype(jnp.float64),
        intr=prob.intr.astype(jnp.float64),
        points=prob.points.astype(jnp.float64),
        obs_xy=prob.obs_xy.astype(jnp.float64))

    # scan carries only the optimized state (model str / index arrays are
    # static or constant and stay closed-over)
    def with_state(state):
        R, t, intr, points = state
        return prob._replace(R=R, t=t, intr=intr, points=points)

    def step(carry, _):
        state, lam = carry
        cur = with_state(state)
        Jv, Jp, r = _jacobians(cur)
        dv, dp = _schur_solve(cur, Jv, Jp, r, lam)
        cand = _apply_step(cur, dv, dp)
        c0 = cost(cur)
        c1 = cost(cand)
        good = jnp.isfinite(c1) & (c1 < c0)
        new_state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(jnp.reshape(good, (1,) * a.ndim), b, a),
            (cur.R, cur.t, cur.intr, cur.points),
            (cand.R, cand.t, cand.intr, cand.points))
        lam_n = jnp.where(good, lam * lam_down, lam * lam_up)
        lam_n = jnp.clip(lam_n, 1e-12, 1e8)
        return (new_state, lam_n), jnp.where(good, c1, c0)

    state0 = (prob.R, prob.t, prob.intr, prob.points)
    (state, _), costs = jax.lax.scan(
        step, (state0, jnp.float64(lam0)), None, length=iterations)
    out = with_state(state)
    return out, {"costs": costs, "initial_cost": cost(prob),
                 "final_cost": cost(out)}


def make_problem(R, t, points, obs_xy, obs_view, obs_valid,
                 intr=None, model: str = "normalized", fixed_views=None):
    """Convenience constructor with dtype/shape policy applied."""
    V = R.shape[0]
    if intr is None:
        intr = jnp.zeros((V, n_intr(model)), jnp.float64)
    if fixed_views is None:
        fixed_views = jnp.zeros((V,), bool).at[0].set(True)
    return BAProblem(
        jnp.asarray(R, jnp.float64), jnp.asarray(t, jnp.float64),
        jnp.asarray(intr, jnp.float64), jnp.asarray(points, jnp.float64),
        jnp.asarray(obs_xy, jnp.float64), jnp.asarray(obs_view, jnp.int32),
        jnp.asarray(obs_valid, bool), jnp.asarray(fixed_views, bool), model)
