"""Dense disparity from two UNCALIBRATED images.

Reference analog: examples/stereo/ExampleStereoUncalibrated.java — match
features between two views of unknown cameras, estimate F robustly,
projectively rectify (Hartley), then run dense block-matching disparity
on the rectified pair.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax
    import jax.numpy as jnp
    from boofcv_tpu.feature import associate, describe, disparity, \
        fasthessian
    from boofcv_tpu.geo import rectify, robust, se3
    from boofcv_tpu.io import simulate
    from boofcv_tpu.ip import distort, integral

    rng = np.random.default_rng(14)
    H, W = 180, 240
    K = np.array([[210.0, 0, W / 2], [0, 210.0, H / 2], [0, 0, 1.0]])
    tex = simulate.noise_texture(rng, size=512, octaves=5) * 255
    tex_near = simulate.noise_texture(rng, size=160, octaves=4) * 255
    R2 = np.asarray(se3.exp_so3(jnp.asarray([0.0, -0.05, 0.0])))
    t2 = np.array([0.45, 0.0, 0.02])

    def render(R, t):
        """Two-depth scene: a near patch over a far plane — F estimation
        needs non-coplanar structure (a single plane leaves F
        undetermined up to the plane homography)."""
        far = np.asarray(simulate.render_plane(
            tex, K, R, t, H, W, plane_origin=(0, 0, 6.0)))
        near = np.asarray(simulate.render_plane(
            tex_near, K, R, t, H, W, plane_origin=(0.5, 0.2, 4.0)))
        return np.where(near > 0, near, far).astype(np.float32)

    img1 = render(np.eye(3), np.zeros(3))
    img2 = render(R2, t2)

    # SURF detect/describe + mutual association
    def dd(img):
        ii = integral.transform(jnp.asarray(img))
        det = fasthessian.detect(ii, max_features=200, threshold=1e3)
        ang = describe.orientation_average_haar(ii, det.ys, det.xs,
                                                det.scales)
        return det, describe.surf(ii, det.ys, det.xs, det.scales, ang)

    d1, f1 = dd(img1)
    d2, f2 = dd(img2)
    m = associate.associate_mutual(associate.score_euclidean_sq(f1, f2),
                                   max_error=0.3)
    v = np.asarray(m.valid) & np.asarray(d1.valid)[np.asarray(m.src)] \
        & np.asarray(d2.valid)[np.asarray(m.dst)]
    p1 = np.stack([np.asarray(d1.xs)[np.asarray(m.src)][v],
                   np.asarray(d1.ys)[np.asarray(m.src)][v]], 1)
    p2 = np.stack([np.asarray(d2.xs)[np.asarray(m.dst)][v],
                   np.asarray(d2.ys)[np.asarray(m.dst)][v]], 1)
    print(f"matched {len(p1)} SURF features")

    res = robust.ransac_fundamental(jax.random.PRNGKey(0),
                                    jnp.asarray(p1), jnp.asarray(p2),
                                    num_hypotheses=256,
                                    inlier_threshold_px=1.0)
    F = np.asarray(res.model[0])
    inl = np.asarray(res.inliers)
    print(f"F inliers: {int(inl.sum())}/{len(p1)}")

    r1, r2 = rectify.rectify_uncalibrated(F, p1[inl], p2[inl], W, H)
    r1, r2 = rectify.adjust_rectification(r1, r2, W, H)

    # projective rectification leaves an arbitrary x-offset between the
    # two images; shift image 2 so the observed disparities start at ~2px
    # (the reference example picks min/max disparity the same way)
    def ap(Hm, p):
        q = np.concatenate([p, np.ones((len(p), 1))], 1) @ Hm.T
        return q[:, :2] / q[:, 2:]
    d_obs = ap(r1, p1[inl])[:, 0] - ap(r2, p2[inl])[:, 0]
    shift = np.floor(np.percentile(d_obs, 2)) - 2.0
    Tx = np.eye(3)
    Tx[0, 2] = shift
    r2 = Tx @ r2
    d_range = int(np.ceil(np.percentile(d_obs, 98) - shift)) + 4

    my1, mx1 = rectify.rectify_maps(r1, H, W)
    my2, mx2 = rectify.rectify_maps(r2, H, W)
    w1 = distort.warp(jnp.asarray(img1), my1, mx1)
    w2 = distort.warp(jnp.asarray(img2), my2, mx2)

    # row alignment check on the inlier correspondences
    dy = np.abs(ap(r1, p1[inl])[:, 1] - ap(r2, p2[inl])[:, 1])
    print(f"rectified row misalignment: median {np.median(dy):.2f} px")

    cfg = disparity.DisparityConfig(min_disparity=0,
                                    max_disparity=max(d_range, 8),
                                    radius_x=3, radius_y=3)
    d = np.asarray(disparity.block_match(w1, w2, cfg))
    valid = d >= 0
    print(f"dense disparity valid: {valid.mean()*100:.0f}% "
          f"(median {np.median(d[valid]):.1f} px)")
    ok = np.median(dy) < 1.0 and valid.mean() > 0.3
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
