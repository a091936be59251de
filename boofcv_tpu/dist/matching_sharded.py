"""Device-parallel pairwise matching + robust geometry.

Reference analog: none (BoofCV's PairwiseImageMatching is sequential);
this is SURVEY §2.9's "NEW: batch/data parallel across frames/images" —
the all-pairs stage of multi-view reconstruction fanned out over a
device mesh with shard_map.

Design: the K image pairs are padded to a multiple of the mesh size and
sharded on the leading axis; every device runs the SAME jitted
match+RANSAC program on its shard (descriptor score matrix -> mutual NN
-> hypothesis-parallel essential RANSAC); results gather back as
fixed-shape arrays (counts, inlier masks, relative poses).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from boofcv_tpu.feature import associate
from boofcv_tpu.geo import robust, epipolar
from boofcv_tpu.dist.mesh import SHARD_AXIS


def match_pairs_sharded(mesh: Mesh, desc, xy, pair_idx, Kinv,
                        num_hypotheses: int = 256,
                        inlier_threshold: float = 2e-5,
                        max_desc_error: float = 0.35,
                        seed: int = 0):
    """Run matching+RANSAC for every (a, b) pair across the mesh.

    desc: [V, N, D] per-view descriptors (fixed capacity, zero-padded);
    xy: [V, N, 2] pixel coords; pair_idx: [K, 2] int; Kinv: [3, 3].
    Returns dict of arrays with leading axis K (the true pair count):
    num_inliers, R, t, src, dst, inliers.
    """
    desc = jnp.asarray(desc, jnp.float32)
    xy = jnp.asarray(xy, jnp.float64)
    pair_idx = jnp.asarray(pair_idx, jnp.int32)
    Kinv = jnp.asarray(Kinv, jnp.float64)
    k_true = pair_idx.shape[0]
    n_dev = mesh.devices.size
    pad = (-k_true) % n_dev
    if pad:
        pair_idx = jnp.concatenate(
            [pair_idx, jnp.zeros((pad, 2), jnp.int32)])
    keys = jax.random.split(jax.random.PRNGKey(seed), pair_idx.shape[0])
    n = desc.shape[1]

    # zero-padded capacity slots must not associate: a pad row and pad
    # column are mutual NNs at score 0, fabricating a correspondence at
    # the padded (0, 0) coordinate that then enters RANSAC
    valid_feat = jnp.linalg.norm(desc, axis=-1) > 0.0         # [V, N]

    def one_pair(key, pair):
        a, b = pair[0], pair[1]
        da = desc[a]
        db = desc[b]
        scores = associate.score_euclidean_sq(da, db)
        m = associate.associate_mutual(scores, max_error=max_desc_error ** 2,
                                       valid_a=valid_feat[a],
                                       valid_b=valid_feat[b])
        # normalized coords of matched points (invalid slots -> zeros)
        pa = xy[a][m.src]
        pb = xy[b][m.dst]
        ha = jnp.concatenate([pa, jnp.ones_like(pa[..., :1])], -1) @ Kinv.T
        hb = jnp.concatenate([pb, jnp.ones_like(pb[..., :1])], -1) @ Kinv.T
        na = ha[..., :2]
        nb = hb[..., :2]
        res = robust.ransac_essential(
            key, na, nb, num_hypotheses=num_hypotheses,
            inlier_threshold=inlier_threshold, valid_mask=m.valid)
        R4, t4 = epipolar.decompose_essential(res.model)
        R, t, _ = epipolar.select_pose_cheirality(
            R4, t4, jnp.where(res.inliers[:, None], na, 0.0),
            jnp.where(res.inliers[:, None], nb, 0.0))
        return {
            "num_inliers": res.num_inliers,
            "R": R, "t": t,
            "src": m.src, "dst": m.dst,
            "inliers": res.inliers & m.valid,
        }

    @partial(shard_map, mesh=mesh,
             in_specs=(P(SHARD_AXIS), P(SHARD_AXIS)),
             out_specs=P(SHARD_AXIS), check_vma=False)
    def run(keys_shard, pairs_shard):
        return jax.vmap(one_pair)(keys_shard, pairs_shard)

    # NOTE: run closes over desc/xy (baked as constants), so each CALL
    # retraces.  Fine for the one-shot all-pairs stage this implements;
    # per-frame callers should use structure2.generate_pairwise_graph's
    # mesh= path, whose chunked program is jit-cached on shapes.
    out = jax.jit(run)(keys, pair_idx)
    return {k: np.asarray(v)[:k_true] for k, v in out.items()}
