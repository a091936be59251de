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


def test_kdtree_association_matches_matmul_path():
    import numpy as np
    import jax.numpy as jnp
    from boofcv_tpu.feature import associate

    rng = np.random.default_rng(4)
    a = rng.normal(0, 1, (200, 32)).astype(np.float32)
    b = np.concatenate([a[:150] + rng.normal(0, 0.01, (150, 32)),
                        rng.normal(0, 1, (80, 32))]).astype(np.float32)
    m_kd = associate.associate_nearest_neighbor_kdtree(a, b,
                                                       max_error=0.25)
    s = associate.score_euclidean_sq(jnp.asarray(a), jnp.asarray(b))
    m_mm = associate.associate_mutual(s, max_error=0.25)
    kd_ok = np.asarray(m_kd.valid)
    mm_ok = np.asarray(m_mm.valid)
    # exact KD search (eps=0) must reproduce the matmul mutual-NN result
    assert np.array_equal(kd_ok, mm_ok)
    assert np.array_equal(np.asarray(m_kd.dst)[kd_ok],
                          np.asarray(m_mm.dst)[mm_ok])
    assert kd_ok.sum() >= 140
