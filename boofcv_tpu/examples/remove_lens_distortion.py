"""Remove lens distortion and convert a fisheye view to a pinhole view.

Reference analogs: examples/calibration/ExampleRemoveLensDistortion.java
and ExampleFisheyeToPinhole.java — build the undistortion transform from
the calibrated camera model and warp the image through it.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.geo import cameras
    from boofcv_tpu.ip import distort
    from boofcv_tpu.io import simulate

    rng = np.random.default_rng(21)
    H, W = 160, 200

    # --- Brown radial distortion round trip ------------------------------
    cam = cameras.CameraPinholeBrown(fx=180.0, fy=180.0, cx=W / 2, cy=H / 2,
                                     width=W, height=H, radial=(-0.25, 0.05))
    tex = simulate.noise_texture(rng, size=340, octaves=5)
    ideal = tex[:H, :W].astype(np.float32)

    # synthesize a DISTORTED capture: for each distorted pixel, sample the
    # ideal (pinhole) image at the corresponding undistorted position
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float64),
                          jnp.arange(W, dtype=jnp.float64), indexing="ij")
    nx, ny = cameras.pixel_to_norm_undistorted(cam, xs, ys)
    ux = nx * cam.fx + cam.cx
    uy = ny * cam.fy + cam.cy
    captured = distort.warp(jnp.asarray(ideal),
                            uy.astype(jnp.float32), ux.astype(jnp.float32))

    # undistortion warp: for each output (pinhole) pixel, find where it
    # lands in the distorted capture
    nx0 = (xs - cam.cx) / cam.fx
    ny0 = (ys - cam.cy) / cam.fy
    dx, dy = cameras.distort_norm(cam, nx0, ny0)
    sx = dx * cam.fx + cam.cx
    sy = dy * cam.fy + cam.cy
    undistorted = np.asarray(distort.warp(
        captured, sy.astype(jnp.float32), sx.astype(jnp.float32)))

    c = np.s_[25:-25, 25:-25]
    err = np.abs(undistorted[c] - ideal[c])
    print(f"brown undistort: median |err| {np.median(err):.1f} "
          f"(image range {ideal.min():.0f}..{ideal.max():.0f})")
    ok = np.median(err) < 6.0

    # --- fisheye (universal omni) -> pinhole ------------------------------
    fish = cameras.CameraUniversalOmni(fx=120.0, fy=120.0, cx=W / 2,
                                       cy=H / 2, width=W, height=H,
                                       mirror_offset=1.0)
    pin = cameras.CameraPinhole(fx=90.0, fy=90.0, cx=W / 2, cy=H / 2,
                                width=W, height=H)
    # output pinhole pixel -> 3D ray -> fisheye pixel
    rx = (xs - pin.cx) / pin.fx
    ry = (ys - pin.cy) / pin.fy
    rays = jnp.stack([rx, ry, jnp.ones_like(rx)], -1)
    fx_px, fy_px = cameras.omni_project(fish, rays)
    pinhole_view = np.asarray(distort.warp(
        captured, jnp.asarray(fy_px, jnp.float32),
        jnp.asarray(fx_px, jnp.float32)))
    # sanity: the center of the fisheye frame maps near the center of the
    # pinhole output, and the warp produced in-range intensities
    print(f"fisheye->pinhole: output range "
          f"{pinhole_view.min():.0f}..{pinhole_view.max():.0f}")
    ok &= np.isfinite(pinhole_view).all() \
        and pinhole_view.max() > pinhole_view.min() + 50
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
