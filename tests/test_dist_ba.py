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
