"""360 imagery: render cameras onto an equirectangular canvas and pull
pinhole views back out.

Reference analogs: examples/imageprocessing/ExampleFisheyeToEquirectangular
.java and ExampleEquirectangularToPinhole.java — a fisheye (universal-omni)
view is projected onto a 360 canvas, rotated, and re-sampled as rotated
pinhole views; every step is a precomputed warp grid + one batched gather.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.geo import cameras, spherical

    # a pinhole "ground truth" scene viewed straight ahead
    pin = cameras.CameraPinhole(fx=140, fy=140, cx=79.5, cy=59.5,
                                width=160, height=120)
    yy, xx = np.mgrid[0:120, 0:160].astype(np.float32)
    view = jnp.asarray(60 + 45 * np.sin(xx / 13.0) * np.cos(yy / 9.0))

    a = 0.6
    R = np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                  [-np.sin(a), 0, np.cos(a)]])

    # camera -> 360 canvas, rotate the canvas, extract the rotated view
    canvas = spherical.camera_to_equi(view, pin, R, (256, 512))
    cov = float(jnp.mean(canvas != 0))
    back = spherical.equi_to_pinhole(canvas, pin, R, (120, 160))
    err = float(np.median(np.abs(np.asarray(back) - np.asarray(view))
                          [20:-20, 20:-20]))
    print(f"camera->equi coverage: {cov:.3f}, "
          f"equi->pinhole round-trip median err: {err:.2f}")

    # fisheye hemisphere onto the canvas
    omni = cameras.CameraUniversalOmni(
        fx=130, fy=130, cx=149.5, cy=149.5, width=300, height=300,
        mirror_offset=1.0)
    fe = jnp.asarray(100 + 50 * np.sin(xx[:120, :160] / 17.0))
    fe = jnp.asarray(np.tile(np.asarray(fe), (3, 2))[:300, :300])
    canvas_fe = spherical.camera_to_equi(fe, omni, np.eye(3), (128, 256))
    cov_fe = float(jnp.mean(canvas_fe != 0))
    print(f"fisheye->equi coverage: {cov_fe:.3f} (hemisphere+ FOV)")

    ok = cov > 0.03 and err < 2.5 and cov_fe > 0.4
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
