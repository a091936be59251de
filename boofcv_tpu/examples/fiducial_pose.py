"""Detect a binary square fiducial and estimate its 6-DoF pose.

Reference analog: examples/fiducial/ExampleFiducialBinary.java — binary
square marker detect -> decode id -> pose from the quad.  The marker is
placed in a synthetic scene; the decoded id and reprojected corners are
checked.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    from boofcv_tpu.recognition import fiducial_square as fid

    rng = np.random.default_rng(7)
    marker_id = 451
    img = fid.encode_marker(marker_id, cells_px=12)
    scene = np.full((260, 340), 170.0, np.float32)
    y0, x0 = 60, 90
    scene[y0:y0 + img.shape[0], x0:x0 + img.shape[1]] = img
    scene += rng.normal(0, 3, scene.shape)

    dets = fid.detect(scene)
    print(f"detections: {len(dets)}")
    if len(dets) != 1 or dets[0]["id"] != marker_id:
        print("FAILED")
        return 1
    corners = dets[0]["corners"]
    print(f"decoded id: {dets[0]['id']}")

    f = 400.0
    K = np.array([[f, 0, scene.shape[1] / 2], [0, f, scene.shape[0] / 2],
                  [0, 0, 1.0]])
    marker_size = 0.2
    R, t = fid.estimate_pose(corners, marker_size=marker_size, K=K)
    s = marker_size / 2
    world = np.array([[-s, -s, 0], [s, -s, 0], [s, s, 0], [-s, s, 0.0]])
    pc = world @ R.T + t
    proj = (pc / pc[:, 2:]) @ K.T
    err = float(np.abs(proj[:, :2] - corners).max())
    print(f"pose: distance {t[2]:.3f} m, corner reprojection err {err:.2f} px")
    ok = err < 1.5 and t[2] > 0
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
