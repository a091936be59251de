"""Multi-device BA parity: sharded solver must match the single-device
solver (SURVEY §4 multi-node plan: virtual 8-device CPU mesh)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from boofcv_tpu.geo import ba, se3
from boofcv_tpu.dist import make_mesh
from boofcv_tpu.dist import ba_sharded

from test_ba import build_scene


@pytest.mark.skipif(jax.device_count() < 2, reason="needs multi-device")
def test_sharded_ba_matches_single_device():
    rng = np.random.default_rng(7)
    pts, Rs, ts, intr, oxy, ov, oval = build_scene(rng, n_views=5,
                                                   n_points=40, noise=1e-4)
    Rp = Rs.copy(); tp = ts.copy()
    for v in range(2, len(Rs)):
        Rp[v] = np.asarray(se3.exp_so3(jnp.asarray(rng.normal(0, 0.01, 3)))) @ Rs[v]
        tp[v] = ts[v] + rng.normal(0, 0.02, 3)
    fixed = np.zeros(len(Rs), bool); fixed[:2] = True
    prob = ba.make_problem(Rp, tp, pts + rng.normal(0, 0.05, pts.shape),
                           oxy, ov, oval, fixed_views=fixed)

    out_single, info_single = ba.optimize(prob, iterations=8)
    mesh = make_mesh()
    out_shard, info_shard = ba_sharded.optimize_sharded(prob, mesh,
                                                        iterations=8)
    # same math, different reduction order -> near-identical trajectories
    np.testing.assert_allclose(np.asarray(info_shard["costs"]),
                               np.asarray(info_single["costs"]),
                               rtol=1e-6, atol=1e-18)
    np.testing.assert_allclose(np.asarray(out_shard.R), np.asarray(out_single.R),
                               atol=1e-8)
    np.testing.assert_allclose(
        np.asarray(out_shard.points[: pts.shape[0]]),
        np.asarray(out_single.points), atol=1e-7)


@pytest.mark.skipif(jax.device_count() < 2, reason="needs multi-device")
def test_sharded_ba_with_padding():
    """Point count not divisible by shard count exercises the pad path."""
    rng = np.random.default_rng(8)
    pts, Rs, ts, intr, oxy, ov, oval = build_scene(rng, n_views=4,
                                                   n_points=37)
    fixed = np.zeros(len(Rs), bool); fixed[:2] = True
    prob = ba.make_problem(Rs, ts, pts + rng.normal(0, 0.03, pts.shape),
                           oxy, ov, oval, fixed_views=fixed)
    mesh = make_mesh()
    out, info = ba_sharded.optimize_sharded(prob, mesh, iterations=8)
    assert float(info["final_cost"]) < 1e-12
    np.testing.assert_allclose(np.asarray(out.points[:37]), pts, atol=1e-5)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8-device mesh")
def test_sharded_ba_large_64views_512points():
    """VERDICT r1 #10 scale point: 64 views / 512 points, parity with the
    single-device solver on the 8-device mesh."""
    rng = np.random.default_rng(11)
    pts, Rs, ts, intr, oxy, ov, oval = build_scene(
        rng, n_views=64, n_points=512, max_obs=6, noise=1e-4)
    Rp = Rs.copy(); tp = ts.copy()
    for v in range(2, len(Rs)):
        Rp[v] = np.asarray(se3.exp_so3(jnp.asarray(rng.normal(0, 0.005, 3)))) @ Rs[v]
        tp[v] = ts[v] + rng.normal(0, 0.01, 3)
    fixed = np.zeros(len(Rs), bool); fixed[:2] = True
    prob = ba.make_problem(Rp, tp, pts + rng.normal(0, 0.02, pts.shape),
                           oxy, ov, oval, fixed_views=fixed)
    out_single, info_single = ba.optimize(prob, iterations=6)
    mesh = make_mesh()
    out_sh, info_sh = ba_sharded.optimize_sharded(prob, mesh, iterations=6)
    c1 = float(info_single["final_cost"])
    c2 = float(info_sh["final_cost"])
    assert abs(c1 - c2) <= 1e-6 * (1.0 + abs(c1))
    np.testing.assert_allclose(np.asarray(out_sh.t), np.asarray(out_single.t),
                               atol=1e-6)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8-device mesh")
def test_sharded_ba_2d_host_mesh_parity():
    """(host, shard) 2D-mesh path (multi-host layout) matches 1D mesh."""
    from boofcv_tpu.dist.mesh import make_mesh_2d
    rng = np.random.default_rng(12)
    pts, Rs, ts, intr, oxy, ov, oval = build_scene(
        rng, n_views=6, n_points=64, noise=1e-4)
    fixed = np.zeros(len(Rs), bool); fixed[:2] = True
    prob = ba.make_problem(Rs, ts, pts + rng.normal(0, 0.03, pts.shape),
                           oxy, ov, oval, fixed_views=fixed)
    out1, info1 = ba_sharded.optimize_sharded(prob, make_mesh(), iterations=5)
    out2, info2 = ba_sharded.optimize_sharded(
        prob, make_mesh_2d(n_hosts=2, devices_per_host=4), iterations=5)
    assert abs(float(info1["final_cost"]) - float(info2["final_cost"])) \
        <= 1e-8 * (1.0 + abs(float(info1["final_cost"])))


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8-device mesh")
def test_sharded_ba_pcg_matches_cholesky():
    """Row-scattered PCG reduced solver (V>1k memory regime) matches the
    dense-Cholesky path; V=66 deliberately not divisible by 8 to cover the
    view padding."""
    rng = np.random.default_rng(13)
    pts, Rs, ts, intr, oxy, ov, oval = build_scene(
        rng, n_views=66, n_points=256, max_obs=6, noise=1e-4)
    Rp = Rs.copy(); tp = ts.copy()
    for v in range(2, len(Rs)):
        tp[v] = ts[v] + rng.normal(0, 0.01, 3)
    fixed = np.zeros(len(Rs), bool); fixed[:2] = True
    prob = ba.make_problem(Rp, tp, pts + rng.normal(0, 0.02, pts.shape),
                           oxy, ov, oval, fixed_views=fixed)
    mesh = make_mesh()
    out_c, info_c = ba_sharded.optimize_sharded(prob, mesh, iterations=5)
    out_p, info_p = ba_sharded.optimize_sharded(
        prob, mesh, iterations=5, reduced_solver="pcg", pcg_iterations=200)
    c1 = float(info_c["final_cost"])
    c2 = float(info_p["final_cost"])
    assert out_p.R.shape[0] == 66
    assert abs(c1 - c2) <= 1e-4 * (1.0 + abs(c1))
    np.testing.assert_allclose(np.asarray(out_p.t), np.asarray(out_c.t),
                               atol=1e-4)


def _big_scene(V=520, P=2048, L=5, seed=21, noise=3e-4):
    """Vectorized forward-motion scene builder (per-point python loops
    do not scale to V>512)."""
    rng = np.random.default_rng(seed)
    pts = np.stack([rng.uniform(-6, 6, P), rng.uniform(-3, 3, P),
                    rng.uniform(4, 30, P)], 1)
    ang = 0.002 * np.arange(V)
    ca, sa = np.cos(ang), np.sin(ang)
    Rs = np.zeros((V, 3, 3))
    Rs[:, 0, 0], Rs[:, 0, 2] = ca, sa
    Rs[:, 1, 1] = 1.0
    Rs[:, 2, 0], Rs[:, 2, 2] = -sa, ca
    cs = np.stack([0.01 * np.arange(V), np.zeros(V),
                   0.03 * np.arange(V)], 1)
    ts = -np.einsum("vij,vj->vi", Rs, cs)
    first = rng.integers(0, V - L, P)
    views = first[:, None] + np.arange(L)[None, :]
    pc = np.einsum("plij,pj->pli", Rs[views], pts) + ts[views]
    ov = pc[..., 2] >= 0.5
    z = np.where(np.abs(pc[..., 2]) < 1e-12, 1e-12, pc[..., 2])
    oxy = pc[..., :2] / z[..., None] + rng.normal(0, noise, (P, L, 2))
    oxy[~ov] = 0.0
    obs_view = np.where(ov, views, 0).astype(np.int32)
    fixed = np.zeros(V, bool)
    fixed[:2] = True
    ts_n = ts + rng.normal(0, 0.005, ts.shape)
    pts_n = pts + rng.normal(0, 0.02, pts.shape)
    return Rs, ts_n, pts_n, oxy, obs_view, ov, fixed


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8-device mesh")
def test_sharded_ba_pcg_at_scale_v520():
    """The memory regime the PCG solver exists for (VERDICT r3 #5): at
    V=520 the psum'd dense system is ~39 MB/device and growing O(V^2);
    PCG keeps only a [V/n, V, D, D] row slab after psum_scatter.  Parity
    oracle: the single-device dense-Cholesky LM on the same f32 problem."""
    Rs, ts, pts, oxy, ov_idx, oval, fixed = _big_scene()
    prob = ba.make_problem(Rs, ts, pts, oxy, ov_idx, oval,
                           fixed_views=fixed, dtype=jnp.float32)
    out_s, info_s = ba.optimize(prob, iterations=2)
    mesh = make_mesh()
    out_p, info_p = ba_sharded.optimize_sharded(
        prob, mesh, iterations=2, reduced_solver="pcg",
        pcg_iterations=120)
    c1 = float(info_s["final_cost"])
    c2 = float(info_p["final_cost"])
    assert np.isfinite(c2)
    assert out_p.R.shape[0] == 520
    assert abs(c1 - c2) <= 5e-3 * (1.0 + abs(c1)), (c1, c2)
    # both must actually reduce the cost
    assert c2 < 0.5 * float(np.asarray(info_p["costs"])[0])
