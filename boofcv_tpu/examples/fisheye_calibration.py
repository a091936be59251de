"""Calibrate a fisheye camera with the universal-omni model.

Reference analog: examples/calibration/ExampleCalibrateFisheye.java —
Zhang99 with the universal-omni (mirror-offset) camera.  Oracle:
synthetic wide-FOV captures of a planar target recover focal and the
mirror offset.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    from boofcv_tpu.calib import zhang99

    rng = np.random.default_rng(6)
    nx, ny = 7, 5
    world = np.stack(np.meshgrid(np.arange(nx) * 0.04,
                                 np.arange(ny) * 0.04), -1).reshape(-1, 2)
    fx, fy, cx, cy = 260.0, 258.0, 320.0, 240.0
    xi = 0.9                                       # strong fisheye

    def project(R, t):
        Xc = np.c_[world, np.zeros(len(world))] @ R.T + t
        n = np.linalg.norm(Xc, axis=1, keepdims=True)
        s = Xc / n
        z = s[:, 2] + xi
        u = fx * s[:, 0] / z + cx
        v = fy * s[:, 1] / z + cy
        return np.stack([u, v], 1)

    obs = []
    for v in range(12):
        w = rng.uniform(-0.5, 0.5, 3)
        th = np.linalg.norm(w)
        kx = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]],
                       [-w[1], w[0], 0]]) / max(th, 1e-9)
        R = np.eye(3) + np.sin(th) * kx + (1 - np.cos(th)) * kx @ kx
        t = np.array([rng.uniform(-0.1, 0.1), rng.uniform(-0.08, 0.08),
                      rng.uniform(0.35, 0.6)])
        obs.append(project(R, t) + rng.normal(0, 0.25, (len(world), 2)))

    res = zhang99.calibrate_mono_omni(world, np.stack(obs))
    # fx and xi are correlated for planar targets in a modest FOV — the
    # well-conditioned combination is the ratio fx/(1+xi) (the effective
    # perspective focal near the axis), which is what downstream
    # undistortion consumes
    eff = res.K[0, 0] / (1.0 + res.mirror_offset)
    eff_true = fx / (1.0 + xi)
    print(f"fx {res.K[0, 0]:.1f}, mirror offset {res.mirror_offset:.3f} "
          f"(true {fx}, {xi}); effective f {eff:.1f} vs {eff_true:.1f}; "
          f"reproj rmse {res.reprojection_rmse:.3f} px")
    ok = (abs(eff - eff_true) / eff_true < 0.03
          and abs(res.mirror_offset - xi) < 0.3
          and res.reprojection_rmse < 0.6)
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
