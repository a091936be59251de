"""Multi-view reconstruction + pose-graph oracles.

The pairwise/incremental pipeline is tested with a synthetic-feature
"detector" (known 3D points projected per view, descriptors = one-hot
identity + noise) so the test isolates graph logic, robust geometry,
triangulation and BA from SURF detection quality — mirroring how the
reference tests EstimateSceneCalibrated on synthetic scenes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from boofcv_tpu.geo import se3
from boofcv_tpu.sfm import reconstruction, pose_graph
from boofcv_tpu.sfm.reconstruction import ImageFeatures


H, W = 240, 320
K = np.array([[200.0, 0, W / 2], [0, 200.0, H / 2], [0, 0, 1.0]])


def synthetic_views(rng, n_views=5, n_points=120):
    pts = np.stack([rng.uniform(-2, 2, n_points),
                    rng.uniform(-1.5, 1.5, n_points),
                    rng.uniform(5, 9, n_points)], 1)
    poses = []
    for v in range(n_views):
        w = rng.normal(0, 0.02, 3)
        R = np.asarray(se3.exp_so3(jnp.asarray(w)))
        c = np.array([0.5 * v, 0.05 * v, 0.1 * v])
        t = -R @ c
        poses.append((R, t))
    # unique descriptors per 3D point
    desc = np.eye(n_points, 64 if n_points <= 64 else n_points)[:, :64]
    desc = rng.normal(0, 1, (n_points, 64))
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)

    feats = []
    for (R, t) in poses:
        Xc = pts @ R.T + t
        proj = (Xc / Xc[:, 2:]) @ K.T
        u, v_ = proj[:, 0], proj[:, 1]
        vis = (Xc[:, 2] > 0) & (u >= 5) & (u < W - 5) & (v_ >= 5) & (v_ < H - 5)
        idx = np.nonzero(vis)[0]
        feats.append((idx, u[idx] + rng.normal(0, 0.1, idx.size),
                      v_[idx] + rng.normal(0, 0.1, idx.size)))
    return pts, poses, desc, feats


def as_image_features(desc, feat, rng):
    idx, u, v = feat
    d = desc[idx] + rng.normal(0, 0.01, (idx.size, 64))
    return ImageFeatures(ys=v.copy(), xs=u.copy(),
                         scales=np.ones(idx.size), desc=d,
                         valid=np.ones(idx.size, bool))


@pytest.fixture(scope="module")
def recon():
    rng = np.random.default_rng(0)
    pts, poses, desc, feats = synthetic_views(rng)
    images = list(range(len(poses)))  # placeholders; detect is overridden
    fobjs = [as_image_features(desc, f, rng) for f in feats]
    graph = reconstruction.build_pairwise_graph(
        images, K, detect=lambda im: fobjs[im])
    out = reconstruction.reconstruct_incremental(graph, K)
    return pts, poses, graph, out


def test_pairwise_graph_complete(recon):
    _, poses, graph, _ = recon
    n = len(poses)
    assert len(graph.edges) >= n - 1
    for e in graph.edges.values():
        assert e.score >= 20


def test_all_views_registered(recon):
    _, poses, _, out = recon
    assert len(out["views"]) == len(poses)
    # 0.1px injected noise => normalized residuals ~5e-4; cost floor ~2e-4
    assert float(out["ba_info"]["final_cost"]) < 1e-3


def test_poses_recovered_up_to_similarity(recon):
    pts, poses, _, out = recon
    # align estimated camera centers to GT with a similarity transform
    c_gt = np.stack([-R.T @ t for R, t in poses])
    c_est = np.stack([-out["poses"][v][0].T @ out["poses"][v][1]
                      for v in out["views"]])
    # Umeyama similarity alignment
    mu_g, mu_e = c_gt.mean(0), c_est.mean(0)
    gg, ee = c_gt - mu_g, c_est - mu_e
    U, S, Vt = np.linalg.svd(ee.T @ gg)
    D = np.eye(3)
    D[2, 2] = np.sign(np.linalg.det(U @ Vt))
    R_al = (U @ D @ Vt).T
    s = np.trace(np.diag(S) @ D) / (ee ** 2).sum()
    res = c_gt - (s * (c_est @ R_al.T) + (mu_g - s * R_al @ mu_e))
    ate = np.sqrt((res ** 2).sum(1)).mean()
    scene_size = np.linalg.norm(c_gt[-1] - c_gt[0])
    assert ate < 0.02 * max(scene_size, 1.0), ate


def test_pose_graph_optimization():
    rng = np.random.default_rng(1)
    n = 8
    # ground-truth poses along a circle-ish path
    Rs, ts = [], []
    for i in range(n):
        R = np.asarray(se3.exp_so3(jnp.asarray([0, 0.1 * i, 0])))
        c = np.array([np.sin(0.3 * i), 0.0, 0.5 * i])
        Rs.append(R)
        ts.append(-R @ c)
    # edges: consecutive + loop closures, exact measurements
    edges = []
    for i in range(n - 1):
        Rij = Rs[i + 1] @ Rs[i].T
        tij = ts[i + 1] - Rij @ ts[i]
        edges.append((i, i + 1, Rij, tij))
    for (i, j) in [(0, 4), (2, 7), (0, 7)]:
        Rij = Rs[j] @ Rs[i].T
        tij = ts[j] - Rij @ ts[i]
        edges.append((i, j, Rij, tij))
    # perturb all but pose 0
    Rp = [Rs[0]] + [np.asarray(se3.exp_so3(jnp.asarray(rng.normal(0, 0.05, 3)))) @ R
                    for R in Rs[1:]]
    tp = [ts[0]] + [t + rng.normal(0, 0.1, 3) for t in ts[1:]]
    g = pose_graph.make_graph(np.stack(Rp), np.stack(tp), edges)
    g2, costs = pose_graph.optimize(g, iterations=25)
    assert float(costs[-1]) < 1e-16
    np.testing.assert_allclose(np.asarray(g2.R[-1]), Rs[-1], atol=1e-6)
    np.testing.assert_allclose(np.asarray(g2.t[-1]), ts[-1], atol=1e-6)
