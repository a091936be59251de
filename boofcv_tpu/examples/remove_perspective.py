"""Remove perspective distortion from a user-selected quadrilateral.

Reference analog: examples/geometry/ExampleRemovePerspectiveDistortion
.java — fit the homography mapping a marked quadrilateral to a fronto-
parallel rectangle and warp.  A textured rectangle is rendered under a
known homography, then recovered.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.geo import epipolar
    from boofcv_tpu.ip import distort
    from boofcv_tpu.io import simulate

    rng = np.random.default_rng(22)
    oh, ow = 80, 120
    doc = (simulate.noise_texture(rng, size=160, octaves=4)[:oh, :ow]
           .astype(np.float32))

    # place the "document" in a larger scene under perspective
    quad_dst = np.array([[40.0, 50], [205, 35], [225, 150], [25, 170]])
    corners_src = np.array([[0, 0], [ow - 1.0, 0], [ow - 1, oh - 1],
                            [0, oh - 1]])
    Hm = np.asarray(epipolar.homography_dlt(
        jnp.asarray(corners_src[None]), jnp.asarray(quad_dst[None])))[0]
    sh, sw = 210, 260
    ys, xs = jnp.meshgrid(jnp.arange(sh, dtype=jnp.float64),
                          jnp.arange(sw, dtype=jnp.float64), indexing="ij")
    Hinv = np.linalg.inv(Hm)
    q = jnp.stack([xs, ys, jnp.ones_like(xs)], -1) @ jnp.asarray(Hinv).T
    sx = q[..., 0] / q[..., 2]
    sy = q[..., 1] / q[..., 2]
    scene = np.asarray(distort.warp(jnp.asarray(doc),
                                    sy.astype(jnp.float32),
                                    sx.astype(jnp.float32)))

    # recover: homography from the marked quad back to the rectangle
    Hrec = np.asarray(epipolar.homography_dlt(
        jnp.asarray(quad_dst[None]), jnp.asarray(corners_src[None])))[0]
    ys2, xs2 = jnp.meshgrid(jnp.arange(oh, dtype=jnp.float64),
                            jnp.arange(ow, dtype=jnp.float64), indexing="ij")
    Hrinv = np.linalg.inv(Hrec)
    q2 = jnp.stack([xs2, ys2, jnp.ones_like(xs2)], -1) @ jnp.asarray(Hrinv).T
    flat = np.asarray(distort.warp(
        jnp.asarray(scene), (q2[..., 1] / q2[..., 2]).astype(jnp.float32),
        (q2[..., 0] / q2[..., 2]).astype(jnp.float32)))

    c = np.s_[6:-6, 6:-6]
    err = np.abs(flat[c] - doc[c])
    print(f"recovered document: median |err| {np.median(err):.1f} "
          f"(texture range {doc.min():.0f}..{doc.max():.0f})")
    ok = np.median(err) < 8.0
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
