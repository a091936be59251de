"""Pose-graph optimization over SE(3) relative-pose constraints.

No direct reference file (the reference's nearest analog is the refine
stage of EstimateSceneCalibrated / sparse BA over poses only); this is
the standard SLAM back-end companion named in BASELINE.json's north star
("multi-view bundle adjustment and pose-graph optimization").

Formulation: world->camera poses T_i = (R_i, t_i); an edge (i, j) with
measured relative pose Z_ij (x_j = Z R x_i ...) contributes residual
r_ij = log_se3(Z_ij^-1 ∘ T_j ∘ T_i^-1) in R^6.  Damped Gauss-Newton with
all edge jacobians built by one vmapped jacfwd; the normal system is
assembled by scatter-add and solved densely (solve_spd) — graphs at VO /
reconstruction scale are tiny next to BA.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from boofcv_tpu.geo import se3
from boofcv_tpu.geo.smalllinalg import solve_spd


class PoseGraph(NamedTuple):
    R: jnp.ndarray        # [V, 3, 3]
    t: jnp.ndarray        # [V, 3]
    edge_i: jnp.ndarray   # [E] int32
    edge_j: jnp.ndarray   # [E]
    Z_R: jnp.ndarray      # [E, 3, 3] measured relative rotations
    Z_t: jnp.ndarray      # [E, 3]
    weight: jnp.ndarray   # [E] information scale
    fixed: jnp.ndarray    # [V] bool


def make_graph(R, t, edges, fixed=None) -> PoseGraph:
    """edges: list of (i, j, R_ij, t_ij[, weight]) with x_j = R_ij x_i + t_ij."""
    ei = np.array([e[0] for e in edges], np.int32)
    ej = np.array([e[1] for e in edges], np.int32)
    ZR = np.stack([np.asarray(e[2], np.float64) for e in edges])
    Zt = np.stack([np.asarray(e[3], np.float64) for e in edges])
    w = np.array([e[4] if len(e) > 4 else 1.0 for e in edges], np.float64)
    V = len(R)
    if fixed is None:
        fixed = np.zeros(V, bool)
        fixed[0] = True
    return PoseGraph(jnp.asarray(R, jnp.float64), jnp.asarray(t, jnp.float64),
                     jnp.asarray(ei), jnp.asarray(ej), jnp.asarray(ZR),
                     jnp.asarray(Zt), jnp.asarray(w), jnp.asarray(fixed))


def _edge_residual(Ri, ti, Rj, tj, ZR, Zt, xi_i, xi_j):
    """r = log(Z^-1 ∘ (T_j ⊕ xi_j) ∘ (T_i ⊕ xi_i)^-1) with local updates."""
    dRi, dti = se3.exp_se3(xi_i)
    dRj, dtj = se3.exp_se3(xi_j)
    Ri2, ti2 = se3.compose(dRi, dti, Ri, ti)
    Rj2, tj2 = se3.compose(dRj, dtj, Rj, tj)
    Rii, tii = se3.invert(Ri2, ti2)
    Rrel, trel = se3.compose(Rj2, tj2, Rii, tii)   # T_j T_i^-1
    ZRi, Zti = se3.invert(ZR, Zt)
    Re, te = se3.compose(ZRi, Zti, Rrel, trel)
    w = se3.log_so3(Re)
    return jnp.concatenate([w, te])


def residuals(graph: PoseGraph):
    zero = jnp.zeros((6,), jnp.float64)
    f = lambda Ri, ti, Rj, tj, ZR, Zt: _edge_residual(
        Ri, ti, Rj, tj, ZR, Zt, zero, zero)
    return jax.vmap(f)(graph.R[graph.edge_i], graph.t[graph.edge_i],
                       graph.R[graph.edge_j], graph.t[graph.edge_j],
                       graph.Z_R, graph.Z_t)


def optimize(graph: PoseGraph, iterations: int = 20, lam0: float = 1e-4):
    """Damped GN pose-graph optimization; returns (graph', costs [it])."""
    V = graph.R.shape[0]
    zero6 = jnp.zeros((6,), jnp.float64)

    def edge_jac(Ri, ti, Rj, tj, ZR, Zt):
        f_i = lambda xi: _edge_residual(Ri, ti, Rj, tj, ZR, Zt, xi, zero6)
        f_j = lambda xj: _edge_residual(Ri, ti, Rj, tj, ZR, Zt, zero6, xj)
        r = f_i(zero6)
        Ji = jax.jacfwd(f_i)(zero6)
        Jj = jax.jacfwd(f_j)(zero6)
        return r, Ji, Jj

    free = (~graph.fixed).astype(jnp.float64)

    def step(carry, _):
        R, t, lam = carry
        r, Ji, Jj = jax.vmap(edge_jac)(
            R[graph.edge_i], t[graph.edge_i],
            R[graph.edge_j], t[graph.edge_j], graph.Z_R, graph.Z_t)
        w = graph.weight[:, None, None]
        # assemble H [V6, V6], g [V6] via scatter-add of edge blocks
        H = jnp.zeros((V, V, 6, 6), jnp.float64)
        g = jnp.zeros((V, 6), jnp.float64)
        Hii = jnp.einsum("eki,ekj->eij", Ji, Ji) * w
        Hjj = jnp.einsum("eki,ekj->eij", Jj, Jj) * w
        Hij = jnp.einsum("eki,ekj->eij", Ji, Jj) * w
        gi = jnp.einsum("eki,ek->ei", Ji, r) * graph.weight[:, None]
        gj = jnp.einsum("eki,ek->ei", Jj, r) * graph.weight[:, None]
        H = H.at[graph.edge_i, graph.edge_i].add(Hii)
        H = H.at[graph.edge_j, graph.edge_j].add(Hjj)
        H = H.at[graph.edge_i, graph.edge_j].add(Hij)
        H = H.at[graph.edge_j, graph.edge_i].add(
            jnp.swapaxes(Hij, -1, -2))
        g = g.at[graph.edge_i].add(gi)
        g = g.at[graph.edge_j].add(gj)
        # gauge fix
        fvd = free[:, None] * jnp.ones((1, 6))
        H = H * fvd[:, None, :, None] * fvd[None, :, None, :]
        H = H.at[jnp.arange(V), jnp.arange(V)].add(
            jax.vmap(jnp.diag)(1.0 - fvd) + lam * jnp.eye(6))
        g = g * fvd
        Hd = H.transpose(0, 2, 1, 3).reshape(6 * V, 6 * V)
        dx = -solve_spd(Hd, g.reshape(-1)).reshape(V, 6) * fvd
        dR, dt = jax.vmap(se3.exp_se3)(dx)
        Rn, tn = jax.vmap(se3.compose)(dR, dt, R, t)
        c0 = jnp.sum(graph.weight[:, None] * r * r)
        rn = jax.vmap(lambda Ri, ti, Rj, tj, ZR, Zt: _edge_residual(
            Ri, ti, Rj, tj, ZR, Zt, zero6, zero6))(
            Rn[graph.edge_i], tn[graph.edge_i], Rn[graph.edge_j],
            tn[graph.edge_j], graph.Z_R, graph.Z_t)
        c1 = jnp.sum(graph.weight[:, None] * rn * rn)
        good = jnp.isfinite(c1) & (c1 < c0)
        R = jnp.where(good, Rn, R)
        t = jnp.where(good, tn, t)
        lam = jnp.clip(jnp.where(good, lam * 0.3, lam * 10.0), 1e-12, 1e8)
        return (R, t, lam), jnp.where(good, c1, c0)

    (R, t, _), costs = jax.lax.scan(
        step, (graph.R, graph.t, jnp.float64(lam0)), None,
        length=iterations)
    return graph._replace(R=R, t=t), costs
