"""Dense disparity to a 3D point cloud.

Reference analog: examples/stereo/ExampleStereoDisparity3D.java — dense
block-matching disparity lifted to camera-frame 3D points
(z = f*B/d, x = (u-cx)z/f, y = (v-cy)z/f).  Oracle: the cloud from a
rendered slanted plane must fit a plane with small residual.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.io import simulate
    from boofcv_tpu.feature import disparity

    H, W = 160, 220
    f = 170.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    B = 0.3
    rng = np.random.default_rng(0)
    frames = simulate.render_stereo_sequence(
        rng, K, B, [(jnp.eye(3), jnp.zeros(3))], H, W,
        plane_origin=(0.0, 0.0, 5.0), plane_y=(0.0, 1.0, -0.25),
        texture_scale=45.0)
    left, right = frames[0]

    cfg = disparity.DisparityConfig(max_disparity=32, radius_x=3,
                                    radius_y=3, texture_threshold=0.0)
    d = np.asarray(disparity.block_match(jnp.asarray(left),
                                         jnp.asarray(right), cfg))
    valid = d > 1.0
    vs, us = np.nonzero(valid)
    z = f * B / d[valid]
    x = (us - W / 2) * z / f
    y = (vs - H / 2) * z / f
    cloud = np.stack([x, y, z], 1)
    # keep sane-range points and fit a plane
    keep = (z > 1.0) & (z < 20.0)
    cloud = cloud[keep]
    A = np.c_[cloud[:, :2], np.ones(len(cloud))]
    coef, *_ = np.linalg.lstsq(A, cloud[:, 2], rcond=None)
    resid = np.abs(A @ coef - cloud[:, 2])
    print(f"cloud points: {len(cloud)} ({valid.mean():.0%} valid), "
          f"plane fit z = {coef[0]:.3f}x + {coef[1]:.3f}y + {coef[2]:.2f}, "
          f"median residual {np.median(resid):.3f} m")
    ok = len(cloud) > 5000 and np.median(resid) < 0.08 \
        and abs(coef[2] - 5.0) < 0.5
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
