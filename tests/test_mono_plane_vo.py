"""Mono plane-VO oracle: camera translating above a textured ground plane."""

import numpy as np
import jax.numpy as jnp

from boofcv_tpu.geo import se3
from boofcv_tpu.io import simulate
from boofcv_tpu.sfm import mono_plane_vo


def test_mono_plane_vo_recovers_metric_motion():
    H, W = 120, 160
    K = np.array([[150.0, 0, W / 2], [0, 150.0, H / 2], [0, 0, 1.0]])
    rng = np.random.default_rng(0)
    # plane straight ahead at distance 4 (normal +z in camera frame):
    # simulate.render_plane's default plane at z~4, no tilt
    tex = simulate.noise_texture(rng)
    poses = []
    for i in range(5):
        R = np.eye(3)
        c = np.array([0.06 * i, 0.02 * i, 0.0])   # translate parallel to plane
        poses.append((jnp.asarray(R), jnp.asarray(-R @ c)))
    frames = [simulate.render_plane(tex, K, R, t, H, W,
                                    plane_origin=(0.0, 0.0, 4.0),
                                    plane_x=(1.0, 0.0, 0.0),
                                    plane_y=(0.0, 1.0, 0.0),
                                    texture_scale=45.0)
              for R, t in poses]
    vo = mono_plane_vo.MonoPlaneVisualOdometry(
        K, plane_normal=(0.0, 0.0, 1.0), plane_distance=4.0,
        num_tracks=200)
    errs = []
    for frame, (Rgt, tgt) in zip(frames, poses):
        assert vo.process(np.asarray(frame))
        _, c = vo.camera_to_world()
        c_gt = -np.asarray(Rgt).T @ np.asarray(tgt)
        errs.append(np.linalg.norm(c - c_gt))
    # metric scale recovered from the known plane distance
    assert errs[-1] < 0.05, errs
