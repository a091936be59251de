"""Sharded RANSAC on the virtual 8-device CPU mesh: result quality must
match the single-device estimator on the same problem."""

import numpy as np
import jax
import jax.numpy as jnp

from boofcv_tpu.dist import mesh as mesh_mod
from boofcv_tpu.dist.ransac_sharded import ransac_pnp_sharded
from boofcv_tpu.geo import se3


def test_sharded_ransac_pnp_recovers_pose_with_outliers():
    mesh = mesh_mod.make_mesh()
    rng = np.random.default_rng(0)
    n = 96
    world = jnp.asarray(np.concatenate(
        [rng.uniform(-2, 2, (n, 2)), rng.uniform(4, 8, (n, 1))], 1))
    Rgt = np.asarray(se3.exp_so3(jnp.asarray([0.1, -0.2, 0.05])))
    tgt = np.array([0.3, -0.1, 0.5])
    Xc = np.asarray(world) @ Rgt.T + tgt
    obs = Xc[:, :2] / Xc[:, 2:]
    obs[:20] += rng.uniform(0.05, 0.2, (20, 2))   # 20% outliers
    res, (R, t) = ransac_pnp_sharded(
        mesh, jax.random.PRNGKey(1), world, jnp.asarray(obs),
        num_hypotheses_per_device=32, inlier_threshold=1e-5)
    assert int(res.num_inliers) >= 70
    assert np.abs(np.asarray(R) - Rgt).max() < 1e-5
    assert np.abs(np.asarray(t) - tgt).max() < 1e-5
    inl = np.asarray(res.inliers)
    assert inl[20:].mean() > 0.95
    assert inl[:20].mean() < 0.2
