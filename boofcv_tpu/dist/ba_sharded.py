"""Point-sharded bundle adjustment over a device mesh.

The scaling design from SURVEY §2.9 / §5: the BA problem's point blocks
(and their observations, in the dense ``[P, L]`` layout) are sharded
across devices; views are replicated.  Each device:

1. computes jacobians + per-point Schur contributions for its point shard
   (``ba._local_system`` — embarrassingly parallel),
2. ``psum``s the partial reduced camera system S and rhs over the mesh
   (one [V,V,D,D]+[V,D] all-reduce riding ICI),
3. solves the (replicated) reduced system locally,
4. back-substitutes its own point updates — no further communication.

This is the BoofCV-analog of "ring-reduced Schur contributions" planned in
SURVEY §5; the same structure runs multi-host over DCN once
jax.distributed is initialized (device order in the mesh keeps the psum
hierarchical).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from boofcv_tpu.geo import ba
from boofcv_tpu.geo.ba import BAProblem
from boofcv_tpu.dist.mesh import SHARD_AXIS


def pad_points_for_mesh(prob: BAProblem, n_shards: int) -> BAProblem:
    """Pad the point axis to a multiple of n_shards with dead observations."""
    Pn = prob.points.shape[0]
    rem = (-Pn) % n_shards
    if rem == 0:
        return prob
    L = prob.obs_view.shape[1]
    return prob._replace(
        points=jnp.concatenate(
            [prob.points, jnp.ones((rem, 3), prob.points.dtype)]),
        obs_xy=jnp.concatenate(
            [prob.obs_xy, jnp.zeros((rem, L, 2), prob.obs_xy.dtype)]),
        obs_view=jnp.concatenate(
            [prob.obs_view, jnp.zeros((rem, L), prob.obs_view.dtype)]),
        obs_valid=jnp.concatenate(
            [prob.obs_valid, jnp.zeros((rem, L), bool)]),
    )


def optimize_sharded(prob: BAProblem, mesh: Mesh, iterations: int = 20,
                     lam0: float = 1e-3, lam_up: float = 10.0,
                     lam_down: float = 0.3):
    """Distributed LM-Schur BA.  Same semantics as :func:`ba.optimize`
    (bitwise-comparable modulo reduction order), point axis sharded over
    ``mesh``'s '{axis}' dimension."""
    n_shards = mesh.devices.size
    prob = pad_points_for_mesh(prob, n_shards)
    prob = prob._replace(
        R=prob.R.astype(jnp.float64), t=prob.t.astype(jnp.float64),
        intr=prob.intr.astype(jnp.float64),
        points=prob.points.astype(jnp.float64),
        obs_xy=prob.obs_xy.astype(jnp.float64))
    V = prob.R.shape[0]
    model = prob.model

    # static (non-carried) per-shard data.  The point axis shards over
    # EVERY mesh axis: on a 1D ('shard',) mesh that is plain data
    # parallelism; on a 2D ('host', 'shard') multi-host mesh the reduced
    # camera psum becomes a hierarchical all-reduce — ICI within a host
    # row, DCN across hosts (SURVEY §2.9 "sequence/ring parallel" row).
    axes = tuple(mesh.axis_names)
    point_specs = P(axes)
    rep = P()

    @partial(
        shard_map, mesh=mesh,
        in_specs=(rep, rep, rep, point_specs, point_specs, point_specs,
                  point_specs, rep, rep),
        out_specs=(rep, point_specs, rep),
        check_vma=False)
    def lm_step(R, t, intr, points, obs_xy, obs_view, obs_valid,
                fixed_views, lam):
        local = BAProblem(R, t, intr, points, obs_xy, obs_view, obs_valid,
                          fixed_views, model)
        Jv, Jp, r = ba._jacobians(local)
        S, gv_t, Hpp_inv, W, gp = ba._local_system(
            obs_view, Jv, Jp, r, lam, V)
        # one all-reduce for the reduced camera system
        S = jax.lax.psum(S, axes)
        gv_t = jax.lax.psum(gv_t, axes)
        dv = ba._solve_reduced(S, gv_t, fixed_views, lam)
        dp = ba._back_substitute(obs_view, Hpp_inv, W, gp, dv)
        # local cost contribution
        c_local = 0.5 * jnp.sum(r * r)
        c = jax.lax.psum(c_local, axes)
        return dv, dp, c

    def cost_state(state):
        R, t, intr, points = state
        return ba.cost(prob._replace(R=R, t=t, intr=intr, points=points))

    def step(carry, _):
        state, lam = carry
        R, t, intr, points = state
        dv, dp, c0 = lm_step(R, t, intr, points, prob.obs_xy, prob.obs_view,
                             prob.obs_valid, prob.fixed_views, lam)
        cand = ba._apply_step(
            prob._replace(R=R, t=t, intr=intr, points=points), dv, dp)
        c1 = cost_state((cand.R, cand.t, cand.intr, cand.points))
        good = jnp.isfinite(c1) & (c1 < c0)
        new_state = jax.tree_util.tree_map(
            lambda a, b: jnp.where(jnp.reshape(good, (1,) * a.ndim), b, a),
            state, (cand.R, cand.t, cand.intr, cand.points))
        lam_n = jnp.clip(jnp.where(good, lam * lam_down, lam * lam_up),
                         1e-12, 1e8)
        return (new_state, lam_n), jnp.where(good, c1, c0)

    state0 = (prob.R, prob.t, prob.intr, prob.points)
    (state, _), costs = jax.lax.scan(
        step, (state0, jnp.float64(lam0)), None, length=iterations)
    out = prob._replace(R=state[0], t=state[1], intr=state[2],
                        points=state[3])
    return out, {"costs": costs, "final_cost": cost_state(state)}
