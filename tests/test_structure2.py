"""Uncalibrated multi-view reconstruction (structure2) oracles: synthetic
features, NO intrinsics given — K must come from self-calibration and all
views must register."""

import numpy as np
import jax.numpy as jnp
import pytest

from boofcv_tpu.geo import se3
from boofcv_tpu.sfm import structure2
from boofcv_tpu.sfm.reconstruction import ImageFeatures

H, W = 240, 320
F = 280.0


def synthetic(rng, n_views=5, n_points=150):
    pts = np.stack([rng.uniform(-2, 2, n_points),
                    rng.uniform(-1.5, 1.5, n_points),
                    rng.uniform(5, 9, n_points)], 1)
    desc = rng.normal(0, 1, (n_points, 64))
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    K = np.array([[F, 0, (W - 1) / 2], [0, F, (H - 1) / 2], [0, 0, 1.0]])
    poses, feats = [], []
    for v in range(n_views):
        R = np.asarray(se3.exp_so3(jnp.asarray(rng.normal(0, 0.03, 3))))
        # non-collinear centers: collinear translation is a critical
        # motion for self-calibration (degenerate dual quadratic)
        c = np.array([0.55 * v, 0.35 * (v % 2), 0.22 * ((v // 2) % 2)])
        t = -R @ c
        poses.append((R, t))
        pc = pts @ R.T + t
        pr = (pc / pc[:, 2:]) @ K.T
        vis = ((pr[:, :2] > 6) & (pr[:, :2] < [W - 6, H - 6])).all(1) \
            & (pc[:, 2] > 0.1)
        idx = np.nonzero(vis)[0]
        perm = rng.permutation(len(idx))
        idx = idx[perm]
        feats.append(ImageFeatures(
            ys=pr[idx, 1] + rng.normal(0, 0.15, len(idx)),
            xs=pr[idx, 0] + rng.normal(0, 0.15, len(idx)),
            scales=np.ones(len(idx)),
            desc=desc[idx] + rng.normal(0, 0.02, (len(idx), 64)),
            valid=np.ones(len(idx), bool)))
    return poses, feats


def test_structure2_uncalibrated_full_pipeline():
    rng = np.random.default_rng(0)
    poses, feats = synthetic(rng)
    it = iter(feats)
    scene = structure2.reconstruct_uncalibrated(
        [np.zeros((H, W), np.float32)] * len(feats),
        detect=lambda im: next(it))
    # all views registered
    assert len(scene["poses"]) == len(feats), sorted(scene["poses"])
    # self-calibrated focal in the right range (3-view self-calib is
    # noise-sensitive; the structure checks below are the strong oracle)
    assert abs(scene["K"][0, 0] - F) / F < 0.15, scene["K"]
    # camera centers match GT up to similarity
    gt = np.stack([-R.T @ t for R, t in poses])
    est = np.stack([-scene["poses"][v][0].T @ scene["poses"][v][1]
                    for v in range(len(poses))])
    gt_c = gt - gt.mean(0)
    est_c = est - est.mean(0)
    s = np.linalg.norm(gt_c) / max(np.linalg.norm(est_c), 1e-12)
    U, _, Vt = np.linalg.svd(est_c.T @ gt_c)
    Rp = (U @ Vt).T
    err = np.linalg.norm(gt_c - s * est_c @ Rp.T, axis=1).max()
    span = np.linalg.norm(gt[-1] - gt[0])
    assert err < 0.08 * span, (err, span)
    assert len(scene["points"]) > 100


def test_structure2_rejects_disconnected():
    rng = np.random.default_rng(1)
    # two unrelated feature sets -> no 3D-consistent edges
    f = [ImageFeatures(ys=rng.uniform(0, H, 30), xs=rng.uniform(0, W, 30),
                       scales=np.ones(30),
                       desc=rng.normal(0, 1, (30, 64)),
                       valid=np.ones(30, bool)) for _ in range(3)]
    it = iter(f)
    with pytest.raises(ValueError):
        structure2.reconstruct_uncalibrated(
            [np.zeros((H, W), np.float32)] * 3, detect=lambda im: next(it))


def orbit_scene(rng, n_views, n_points, h=H, w=W, f=F):
    """Arc of cameras around a 3D point cloud with JITTERED look-at
    targets (optical axes through one common point form a critical
    motion sequence for focal self-calibration)."""
    pts = np.stack([rng.uniform(-3, 3, n_points),
                    rng.uniform(-2, 2, n_points),
                    rng.uniform(-3, 3, n_points)], 1)
    desc = rng.normal(0, 1, (n_points, 64))
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    K = np.array([[f, 0, (w - 1) / 2], [0, f, (h - 1) / 2], [0, 0, 1.0]])
    poses, feats = [], []
    for v in range(n_views):
        ang = 0.9 * v / n_views * np.pi
        c = np.array([10 * np.sin(ang), 0.5 * np.sin(3 * ang),
                      -10 * np.cos(ang)])
        tgt = rng.uniform(-1.5, 1.5, 3)
        z = (tgt - c) / np.linalg.norm(tgt - c)
        x = np.cross([0, 1, 0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        R = np.stack([x, y, z])
        t = -R @ c
        poses.append((R, t))
        pc = pts @ R.T + t
        pr = (pc / pc[:, 2:]) @ K.T
        vis = ((pr[:, :2] > 6) & (pr[:, :2] < [w - 6, h - 6])).all(1) \
            & (pc[:, 2] > 0.5)
        idx = np.nonzero(vis)[0]
        idx = idx[rng.permutation(len(idx))]
        feats.append(ImageFeatures(
            ys=pr[idx, 1] + rng.normal(0, 0.15, len(idx)),
            xs=pr[idx, 0] + rng.normal(0, 0.15, len(idx)),
            scales=np.ones(len(idx)),
            desc=desc[idx] + rng.normal(0, 0.02, (len(idx), 64)),
            valid=np.ones(len(idx), bool)))
    return poses, feats


def test_structure2_orbit_10_views_all_register():
    """Wide-arc 10-view uncalibrated scene: every view must register and
    the self-calibrated focal must land near truth (the 50-view version
    of this scene is the round-4 scaling workload — 294 s on the 2-core
    host; 10 views keeps the suite fast)."""
    rng = np.random.default_rng(3)
    poses, feats = orbit_scene(rng, n_views=10, n_points=250)
    it = iter(feats)
    scene = structure2.reconstruct_uncalibrated(
        [np.zeros((H, W), np.float32)] * 10, detect=lambda im: next(it))
    assert len(scene["poses"]) == 10, sorted(scene["poses"])
    assert abs(scene["K"][0, 0] - F) / F < 0.1, scene["K"]
    # camera centers to GT by similarity (Umeyama via pairwise ratios)
    c_gt = np.stack([-R.T @ t for R, t in poses])
    c_es = np.stack([-R.T @ t for R, t in
                     (scene["poses"][v] for v in range(10))])
    d_gt = np.linalg.norm(c_gt[1:] - c_gt[0], axis=1)
    d_es = np.linalg.norm(c_es[1:] - c_es[0], axis=1)
    s = np.median(d_gt / np.maximum(d_es, 1e-12))
    assert np.abs(d_es * s - d_gt).max() < 0.08 * d_gt.max(), \
        (d_es * s, d_gt)
