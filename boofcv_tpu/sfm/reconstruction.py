"""Multi-view metric reconstruction (SfM).

Reference analog: boofcv-sfm alg/sfm/structure/ —
PairwiseImageMatching.java:49,169 (all-pairs detect/describe/associate +
robust F/E -> graph), PairwiseImageGraph.java,
EstimateSceneCalibrated.java:65,111 (seed selection, essential decompose
:175, incremental growth with PnP + triangulate-as-you-grow :296-580),
ThreeViewEstimateMetricScene.java.

TPU split (SURVEY §3.5): detect/describe/associate/RANSAC/triangulation/BA
run batched on device; graph bookkeeping (track tables, which image joins
next) is host-side Python exactly like the reference's graph logic.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from boofcv_tpu.ip import integral as ii_ops
from boofcv_tpu.feature import fasthessian, describe, associate
from boofcv_tpu.geo import robust, epipolar, triangulate, pnp, se3, ba


@dataclass
class ImageFeatures:
    ys: np.ndarray
    xs: np.ndarray
    scales: np.ndarray
    desc: np.ndarray      # [N, 64]
    valid: np.ndarray


def detect_describe(image, max_features: int = 300) -> ImageFeatures:
    """SURF detect+describe (WrapDetectDescribeSurf analog)."""
    img = jnp.asarray(image, jnp.float32)
    ii = ii_ops.transform(img)
    det = fasthessian.detect_multi_octave(ii, max_features_per_octave=max_features // 2)
    angles = describe.orientation_average_haar(ii, det.ys, det.xs, det.scales)
    desc = describe.surf(ii, det.ys, det.xs, det.scales, angles)
    return ImageFeatures(np.asarray(det.ys), np.asarray(det.xs),
                         np.asarray(det.scales), np.asarray(desc),
                         np.asarray(det.valid))


def match_features(fa: ImageFeatures, fb: ImageFeatures,
                   max_error: float = 0.35):
    """Mutual-NN association on the [N, M] score matrix (one matmul)."""
    scores = associate.score_euclidean_sq(jnp.asarray(fa.desc),
                                          jnp.asarray(fb.desc))
    big = 1e12
    scores = jnp.where(jnp.asarray(fa.valid)[:, None], scores, big)
    scores = jnp.where(jnp.asarray(fb.valid)[None, :], scores, big)
    m = associate.associate_mutual(scores, max_error=max_error ** 2)
    src = np.asarray(m.src)
    dst = np.asarray(m.dst)
    ok = np.asarray(m.valid)
    return src[ok], dst[ok]


@dataclass
class PairwiseEdge:
    view_a: int
    view_b: int
    matches_a: np.ndarray     # feature indices in view a
    matches_b: np.ndarray
    inliers: np.ndarray       # bool over matches
    R: np.ndarray             # relative pose: x_b = R x_a + t (unit t)
    t: np.ndarray
    score: int


@dataclass
class PairwiseGraph:
    features: List[ImageFeatures]
    edges: Dict[Tuple[int, int], PairwiseEdge] = field(default_factory=dict)


def build_pairwise_graph(images, K, max_features: int = 300,
                         min_inliers: int = 20, seed: int = 0,
                         detect=None) -> PairwiseGraph:
    """All-pairs matching + robust essential (PairwiseImageMatching.process).

    ``detect``: optional override returning ImageFeatures (for tests)."""
    detect = detect or (lambda im: detect_describe(im, max_features))
    K = np.asarray(K, np.float64)
    Kinv = np.linalg.inv(K)
    feats = [detect(im) for im in images]
    graph = PairwiseGraph(feats)
    key = jax.random.PRNGKey(seed)
    n = len(images)
    for a in range(n):
        for b in range(a + 1, n):
            src, dst = match_features(feats[a], feats[b])
            if src.size < 16:
                continue
            pa = np.stack([feats[a].xs[src], feats[a].ys[src]], 1)
            pb = np.stack([feats[b].xs[dst], feats[b].ys[dst]], 1)
            na = (np.concatenate([pa, np.ones((len(pa), 1))], 1) @ Kinv.T)[:, :2]
            nb = (np.concatenate([pb, np.ones((len(pb), 1))], 1) @ Kinv.T)[:, :2]
            key, sub = jax.random.split(key)
            res = robust.ransac_essential(sub, jnp.asarray(na), jnp.asarray(nb),
                                          num_hypotheses=256,
                                          inlier_threshold=2e-5)
            inl = np.asarray(res.inliers)
            if inl.sum() < min_inliers:
                continue
            E = np.asarray(res.model)
            R4, t4 = epipolar.decompose_essential(jnp.asarray(E))
            R, t, _ = epipolar.select_pose_cheirality(
                R4, t4, jnp.asarray(na[inl]), jnp.asarray(nb[inl]))
            graph.edges[(a, b)] = PairwiseEdge(
                a, b, src, dst, inl, np.asarray(R), np.asarray(t),
                int(inl.sum()))
    return graph


def reconstruct_incremental(graph: PairwiseGraph, K, ba_iterations: int = 15,
                            seed: int = 1):
    """Incremental metric growth + final BA (EstimateSceneCalibrated).

    Returns dict with per-view (R, t), world points, and the BAProblem.
    """
    K = np.asarray(K, np.float64)
    Kinv = np.linalg.inv(K)
    if not graph.edges:
        raise ValueError("empty pairwise graph")

    def norm_coords(view, idxs):
        f = graph.features[view]
        p = np.stack([f.xs[idxs], f.ys[idxs], np.ones(len(idxs))], 1)
        return (p @ Kinv.T)[:, :2]

    # --- seed: best edge (defineCoordinateSystem :671)
    seed_edge = max(graph.edges.values(), key=lambda e: e.score)
    a, b = seed_edge.view_a, seed_edge.view_b
    poses = {a: (np.eye(3), np.zeros(3)),
             b: (seed_edge.R, seed_edge.t)}  # world = camera a

    # track table: (view, feature_idx) -> point id
    obs_of_point: List[List[Tuple[int, int, np.ndarray]]] = []
    point_xyz: List[np.ndarray] = []
    feat_to_point: Dict[Tuple[int, int], int] = {}

    ia = seed_edge.matches_a[seed_edge.inliers]
    ib = seed_edge.matches_b[seed_edge.inliers]
    na = norm_coords(a, ia)
    nb = norm_coords(b, ib)
    X = np.asarray(triangulate.triangulate_two_view_linear(
        jnp.asarray(na), jnp.asarray(nb), jnp.asarray(seed_edge.R),
        jnp.asarray(seed_edge.t)))
    good = X[:, 2] > 0
    for i in range(len(X)):
        if not good[i]:
            continue
        pid = len(point_xyz)
        point_xyz.append(X[i])
        obs_of_point.append([(a, ia[i], na[i]), (b, ib[i], nb[i])])
        feat_to_point[(a, ia[i])] = pid
        feat_to_point[(b, ib[i])] = pid

    # --- grow (estimateAllFeatures :402)
    key = jax.random.PRNGKey(seed)
    remaining = set(range(len(graph.features))) - set(poses)
    while remaining:
        # image with most 2D-3D correspondences through graph edges
        best_view, best_pairs = None, []
        for v in remaining:
            pairs = []
            for (x, y), e in graph.edges.items():
                if x == v and y in poses:
                    known, own = e.matches_b, e.matches_a
                    kv = y
                elif y == v and x in poses:
                    known, own = e.matches_a, e.matches_b
                    kv = x
                else:
                    continue
                for mi in np.nonzero(e.inliers)[0]:
                    pid = feat_to_point.get((kv, known[mi]))
                    if pid is not None:
                        pairs.append((pid, own[mi]))
            if len(pairs) > len(best_pairs):
                best_view, best_pairs = v, pairs
        if best_view is None or len(best_pairs) < 6:
            break  # disconnected remainder
        pids = np.array([p for p, _ in best_pairs])
        fidx = np.array([f for _, f in best_pairs])
        world = np.stack([point_xyz[p] for p in pids])
        obs = norm_coords(best_view, fidx)
        key, sub = jax.random.split(key)
        res, (R, t) = robust.ransac_pnp(sub, jnp.asarray(world),
                                        jnp.asarray(obs),
                                        num_hypotheses=256,
                                        inlier_threshold=2e-5)
        R, t = np.asarray(R), np.asarray(t)
        poses[best_view] = (R, t)
        remaining.discard(best_view)
        # register this view's observations of existing points
        inl = np.asarray(res.inliers)
        for i in np.nonzero(inl)[0]:
            obs_of_point[pids[i]].append((best_view, fidx[i], obs[i]))
            feat_to_point[(best_view, fidx[i])] = pids[i]
        # triangulate brand-new tracks with already-registered views
        for (x, y), e in graph.edges.items():
            if x in poses and y in poses and (x == best_view or y == best_view):
                Rx, tx = poses[x]
                Ry, ty = poses[y]
                # relative pose x->y
                Rrel = Ry @ Rx.T
                trel = ty - Rrel @ tx
                mi = np.nonzero(e.inliers)[0]
                new = [i for i in mi
                       if (x, e.matches_a[i]) not in feat_to_point
                       and (y, e.matches_b[i]) not in feat_to_point]
                if not new:
                    continue
                ia = e.matches_a[new]
                ib = e.matches_b[new]
                na = norm_coords(x, ia)
                nb = norm_coords(y, ib)
                Xl = np.asarray(triangulate.triangulate_two_view_linear(
                    jnp.asarray(na), jnp.asarray(nb), jnp.asarray(Rrel),
                    jnp.asarray(trel)))
                # to world: X_w = Rx^T (X_x - tx)
                Xw = (Xl - tx) @ Rx
                zok = Xl[:, 2] > 0
                for i in range(len(new)):
                    if not zok[i]:
                        continue
                    pid = len(point_xyz)
                    point_xyz.append(Xw[i])
                    obs_of_point.append([(x, ia[i], na[i]), (y, ib[i], nb[i])])
                    feat_to_point[(x, ia[i])] = pid
                    feat_to_point[(y, ib[i])] = pid

    # --- final BA (convertToOutput :240 + bundleSparseMetric)
    views = sorted(poses)
    vmap_idx = {v: i for i, v in enumerate(views)}
    P = len(point_xyz)
    L = max(len(o) for o in obs_of_point)
    obs_xy = np.zeros((P, L, 2))
    obs_view = np.zeros((P, L), np.int32)
    obs_valid = np.zeros((P, L), bool)
    for p, olist in enumerate(obs_of_point):
        for s, (v, _, xy) in enumerate(olist[:L]):
            obs_xy[p, s] = xy
            obs_view[p, s] = vmap_idx[v]
            obs_valid[p, s] = True
    Rs = np.stack([poses[v][0] for v in views])
    ts = np.stack([poses[v][1] for v in views])
    fixed = np.zeros(len(views), bool)
    fixed[0] = True
    # pin scale: also fix the seed partner's pose
    if len(views) > 1:
        fixed[vmap_idx.get(b, 1 if len(views) > 1 else 0)] = True
    prob = ba.make_problem(Rs, ts, np.stack(point_xyz), obs_xy, obs_view,
                           obs_valid, fixed_views=fixed)
    out, info = ba.optimize(prob, iterations=ba_iterations)
    return {
        "views": views,
        "poses": {v: (np.asarray(out.R[vmap_idx[v]]),
                      np.asarray(out.t[vmap_idx[v]])) for v in views},
        "points": np.asarray(out.points),
        "problem": out,
        "view_index": dict(vmap_idx),
        "ba_info": info,
    }
