"""Estimate camera pose from 2D-3D correspondences (PnP).

Reference analog: examples/sfm/ExamplePnP.java — P3P + RANSAC on noisy
correspondences with outliers, then nonlinear refinement.  Ground-truth
pose is known, so rotation/translation errors are printed and checked.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax
    import jax.numpy as jnp
    from boofcv_tpu.geo import robust, se3

    rng = np.random.default_rng(9)
    n = 120
    world = np.stack([rng.uniform(-2, 2, n), rng.uniform(-2, 2, n),
                      rng.uniform(4, 10, n)], 1)
    R_gt = np.asarray(se3.exp_so3(jnp.asarray([0.05, -0.1, 0.08])))
    t_gt = np.array([0.3, -0.2, 0.5])
    f = 500.0
    pc = world @ R_gt.T + t_gt
    obs = pc[:, :2] / pc[:, 2:]                       # normalized coords
    obs += rng.normal(0, 0.5 / f, obs.shape)          # ~0.5 px noise
    bad = rng.random(n) < 0.25
    obs[bad] += rng.uniform(-0.1, 0.1, (int(bad.sum()), 2))

    res, (R, t) = robust.ransac_pnp(
        jax.random.PRNGKey(0), jnp.asarray(world), jnp.asarray(obs),
        num_hypotheses=256, inlier_threshold=(2.0 / f) ** 2,
        refine_iterations=10)
    R = np.asarray(R)
    t = np.asarray(t)
    rot_err = np.degrees(float(se3.rotation_angle(
        jnp.asarray(R.T @ R_gt))))
    t_err = float(np.linalg.norm(t - t_gt))
    inl = np.asarray(res.inliers)
    print(f"inliers: {int(inl.sum())}/{n} "
          f"(true outliers excluded: {int((~inl[bad]).sum())}/{int(bad.sum())})")
    print(f"rotation error: {rot_err:.4f} deg, translation error: {t_err:.4f}")
    ok = rot_err < 0.1 and t_err < 0.01 and not inl[bad].any()
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
