"""Run stereo visual odometry over image-sequence directories.

Reference analog: examples/sfm/ExampleVisualOdometryStereo.java.

Usage:
    python -m boofcv_tpu.cli.stereo_vo_demo --left DIR --right DIR \
        --calib stereo.yaml [--output trajectory.txt]
Left/right images must already be rectified OR a stereo calib YAML is
given (rectification maps are built from it).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--left", required=True)
    ap.add_argument("--right", required=True)
    ap.add_argument("--calib", help="stereo calibration yaml")
    ap.add_argument("--fx", type=float, default=500.0)
    ap.add_argument("--baseline", type=float, default=0.3)
    ap.add_argument("--output", default="trajectory.txt")
    args = ap.parse_args(argv)

    from boofcv_tpu.io import image_io
    from boofcv_tpu.sfm import stereo_vo

    lefts = image_io.load_sequence(args.left)
    rights = image_io.load_sequence(args.right)
    if not lefts or len(lefts) != len(rights):
        print("empty or mismatched sequences", file=sys.stderr)
        return 1
    h, w = image_io.to_gray(lefts[0]).shape

    if args.calib:
        from boofcv_tpu.io import calibration_io as cio
        from boofcv_tpu.geo import rectify
        sp = cio.load_stereo(args.calib)
        # right-to-left -> left-to-right transform
        R = sp.R_right_to_left.T
        t = -R @ sp.t_right_to_left
        rp = rectify.rectify_calibrated(sp.left.K, sp.right.K, R, t)
        K = np.asarray(rp.rectK)
        baseline = rp.baseline
        import jax.numpy as jnp
        from boofcv_tpu.ip.interpolate import bilinear
        my1, mx1 = rectify.rectify_maps(rp.rect1, h, w)
        my2, mx2 = rectify.rectify_maps(rp.rect2, h, w)

        def rect(lr):
            l, r = lr
            return (np.asarray(bilinear(jnp.asarray(image_io.to_gray(l)), my1, mx1)),
                    np.asarray(bilinear(jnp.asarray(image_io.to_gray(r)), my2, mx2)))
    else:
        K = np.array([[args.fx, 0, w / 2], [0, args.fx, h / 2], [0, 0, 1.0]])
        baseline = args.baseline

        def rect(lr):
            return image_io.to_gray(lr[0]), image_io.to_gray(lr[1])

    cfg = stereo_vo.StereoVoConfig()
    vo = stereo_vo.StereoVisualOdometry(cfg, K, baseline, h, w)
    with open(args.output, "w") as f:
        for i, lr in enumerate(zip(lefts, rights)):
            l, r = rect(lr)
            ok = vo.process(l, r)
            R, c = vo.camera_to_world()
            f.write(" ".join(f"{v:.6f}" for v in
                             np.concatenate([np.asarray(R).ravel(), c])) + "\n")
            print(f"frame {i}: ok={ok} pos=({c[0]:.3f}, {c[1]:.3f}, "
                  f"{c[2]:.3f}) inliers={vo.metrics.get('inliers', '-')}")
    print(f"trajectory -> {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
