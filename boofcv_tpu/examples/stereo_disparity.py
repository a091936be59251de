"""Dense stereo disparity: block matching and semi-global matching.

Reference analog: examples/stereo/ExampleStereoDisparity.java (BM +
ConfigDisparityBMBest5) and the SGM variants.  A rectified stereo pair
is rendered from a textured slanted plane with known depth, so the
disparity maps are checked against the analytic ground truth.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.feature import disparity
    from boofcv_tpu.io import simulate

    rng = np.random.default_rng(5)
    H, W = 120, 160
    f, b = 150.0, 0.3
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    R0 = np.eye(3)
    frames = simulate.render_stereo_sequence(
        rng, K, b, [(jnp.asarray(R0), jnp.zeros(3))], H, W,
        plane_origin=(0.0, 0.0, 4.0))
    left, right = frames[0]
    z = 4.0
    d_gt = f * b / z  # frontal plane: constant disparity

    results = {}
    cfg = disparity.DisparityConfig(min_disparity=0, max_disparity=24,
                                    radius_x=3, radius_y=3)
    for name, fn in [
        ("block_match", lambda l, r: disparity.block_match(l, r, cfg)),
        ("best5", lambda l, r: disparity.block_match_best5(l, r, cfg)),
        ("sgm", lambda l, r: disparity.sgm(
            l, r, disparity.SgmConfig(min_disparity=0, max_disparity=24))),
    ]:
        d = np.asarray(fn(jnp.asarray(left), jnp.asarray(right)))
        valid = d >= 0
        err = np.abs(d[valid] - d_gt)
        results[name] = (float(valid.mean()), float(np.median(err)))
        print(f"{name:12s}: valid {valid.mean()*100:5.1f}%  "
              f"median |d - d_gt| = {np.median(err):.2f} px "
              f"(d_gt = {d_gt:.2f})")

    ok = all(v > 0.5 and e < 1.0 for v, e in results.values())
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
