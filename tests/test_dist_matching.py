"""Sharded pairwise matching parity vs the host pipeline."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from boofcv_tpu.dist import make_mesh
from boofcv_tpu.dist import matching_sharded
from boofcv_tpu.geo import se3


@pytest.mark.skipif(jax.device_count() < 2, reason="needs multi-device")
def test_sharded_pairwise_matching():
    rng = np.random.default_rng(0)
    V, N = 4, 80
    K = np.array([[200.0, 0, 160], [0, 200.0, 120], [0, 0, 1.0]])
    pts = np.stack([rng.uniform(-2, 2, N), rng.uniform(-1.5, 1.5, N),
                    rng.uniform(5, 8, N)], 1)
    desc0 = rng.normal(0, 1, (N, 32)).astype(np.float32)
    desc0 /= np.linalg.norm(desc0, axis=1, keepdims=True)

    descs = np.zeros((V, N, 32), np.float32)
    xys = np.zeros((V, N, 2))
    poses = []
    for v in range(V):
        R = np.asarray(se3.exp_so3(jnp.asarray(rng.normal(0, 0.02, 3))))
        t = np.array([0.4 * v, 0.0, 0.0])
        poses.append((R, t))
        Xc = pts @ R.T + t
        proj = (Xc / Xc[:, 2:]) @ K.T
        # shuffle feature order per view so matching is non-trivial
        perm = rng.permutation(N)
        xys[v] = proj[perm, :2] + rng.normal(0, 0.1, (N, 2))
        descs[v] = desc0[perm] + rng.normal(0, 0.01, (N, 32))

    pairs = np.array([(a, b) for a in range(V) for b in range(a + 1, V)])
    mesh = make_mesh()
    out = matching_sharded.match_pairs_sharded(
        mesh, descs, xys, pairs, np.linalg.inv(K))
    assert out["num_inliers"].shape[0] == len(pairs)
    for k, (a, b) in enumerate(pairs):
        assert out["num_inliers"][k] > 0.7 * N, (a, b, out["num_inliers"][k])
        # relative rotation parity
        R_gt = poses[b][0] @ poses[a][0].T
        np.testing.assert_allclose(out["R"][k], R_gt, atol=1e-2)
