"""RGB-D depth image to a colored 3D point cloud.

Reference analog: examples/sfm/ExampleDepthPointCloud.java — lift every
depth pixel through the pinhole model.  Oracle: the cloud from an exact
synthetic depth map of a tilted plane reproduces the plane equation.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp

    H, W, f = 120, 160, 150.0
    cx, cy = W / 2, H / 2
    # plane: n . X = d with n = (0.1, -0.2, 1)/|.|, through (0,0,5)
    n = np.array([0.1, -0.2, 1.0])
    n /= np.linalg.norm(n)
    d = n @ np.array([0, 0, 5.0])
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    rays = np.stack([(xs - cx) / f, (ys - cy) / f, np.ones_like(xs)], -1)
    depth = (d / (rays @ n))                     # z along the ray? no: scale
    Xc = rays * depth[..., None]                 # points on the plane
    zimg = jnp.asarray(Xc[..., 2], jnp.float32)  # depth image (z)

    # lift back on device: one fused elementwise program
    yj, xj = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    X = jnp.stack([(xj - cx) / f * zimg, (yj - cy) / f * zimg, zimg], -1)
    cloud = np.asarray(X).reshape(-1, 3)

    resid = np.abs(cloud @ n - d)
    print(f"cloud points: {len(cloud)}, plane residual max "
          f"{resid.max():.2e}, depth range {cloud[:, 2].min():.2f}.."
          f"{cloud[:, 2].max():.2f} m")
    ok = resid.max() < 1e-3 and len(cloud) == H * W
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
