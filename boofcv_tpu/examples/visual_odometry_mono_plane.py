"""Monocular plane-VO: metric motion from one camera + a known ground
plane.

Reference analog: examples/sfm/ExampleVisualOdometryMonocularPlane.java
— homography tracking against a plane of known orientation/height makes
monocular motion metric.  Oracle: recovered centers match the simulated
translation parallel to the plane.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.io import simulate
    from boofcv_tpu.sfm import mono_plane_vo

    H, W = 120, 160
    K = np.array([[150.0, 0, W / 2], [0, 150.0, H / 2], [0, 0, 1.0]])
    rng = np.random.default_rng(0)
    tex = simulate.noise_texture(rng)
    poses = []
    for i in range(5):
        R = np.eye(3)
        c = np.array([0.06 * i, 0.02 * i, 0.0])
        poses.append((R, -R @ c))
    frames = [simulate.render_plane(tex, K, jnp.asarray(R), jnp.asarray(t),
                                    H, W, plane_origin=(0.0, 0.0, 4.0),
                                    plane_x=(1.0, 0.0, 0.0),
                                    plane_y=(0.0, 1.0, 0.0),
                                    texture_scale=45.0)
              for R, t in poses]
    vo = mono_plane_vo.MonoPlaneVisualOdometry(
        K, plane_normal=(0.0, 0.0, 1.0), plane_distance=4.0,
        num_tracks=200)
    errs = []
    for frame, (Rgt, tgt) in zip(frames, poses):
        if not vo.process(np.asarray(frame)):
            print("FAILED (motion estimation)")
            return 1
        _, c = vo.camera_to_world()
        errs.append(np.linalg.norm(c - (-Rgt.T @ tgt)))
    print(f"frames: {len(frames)}, final center error {errs[-1]:.4f} m "
          "(metric scale from the known plane height)")
    ok = errs[-1] < 0.05
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
