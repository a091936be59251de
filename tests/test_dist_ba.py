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
