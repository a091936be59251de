"""Bundle-Adjustment-in-the-Large (BAL) dataset codec.

Reference analog: boofcv-io io/geo/CodecBundleAdjustmentInTheLarge.java —
parses the BAL text format (http://grail.cs.washington.edu/projects/bal/):

    num_cameras num_points num_observations
    <obs>: camera_idx point_idx x y          (num_observations lines)
    <cameras>: 9 values each — rodrigues(3), t(3), f, k1, k2
    <points>: 3 values each

and converts to/from our dense [P, L] BAProblem layout (SURVEY §2.8: the
BAL codec is kept as the BA benchmark input).
"""

from __future__ import annotations

import gzip

import numpy as np
import jax.numpy as jnp

from boofcv_tpu.geo import ba, se3


def read_bal(path: str):
    """Parse a BAL file (optionally .gz).  Returns dict of raw arrays."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        tokens = f.read().split()
    it = iter(tokens)
    n_cam = int(next(it)); n_pts = int(next(it)); n_obs = int(next(it))
    cam_idx = np.zeros(n_obs, np.int32)
    pt_idx = np.zeros(n_obs, np.int32)
    xy = np.zeros((n_obs, 2), np.float64)
    for i in range(n_obs):
        cam_idx[i] = int(next(it)); pt_idx[i] = int(next(it))
        xy[i, 0] = float(next(it)); xy[i, 1] = float(next(it))
    cams = np.array([float(next(it)) for _ in range(9 * n_cam)],
                    np.float64).reshape(n_cam, 9)
    pts = np.array([float(next(it)) for _ in range(3 * n_pts)],
                   np.float64).reshape(n_pts, 3)
    return {"camera_index": cam_idx, "point_index": pt_idx, "obs": xy,
            "cameras": cams, "points": pts}


def to_problem(data, max_obs_per_point: int | None = None) -> ba.BAProblem:
    """BAL arrays -> BAProblem ('snavely' camera model, [P, L] layout).

    Observations beyond max_obs_per_point (default: the true max) are
    dropped with a stderr warning reporting the count (rare in BAL
    sets; BAProblem is a fixed-field NamedTuple, so the count cannot
    ride on the returned object).
    """
    cams = data["cameras"]
    n_cam = cams.shape[0]
    pts = data["points"]
    n_pts = pts.shape[0]
    counts = np.bincount(data["point_index"], minlength=n_pts)
    L = int(counts.max()) if max_obs_per_point is None else max_obs_per_point

    obs_xy = np.zeros((n_pts, L, 2))
    obs_view = np.zeros((n_pts, L), np.int32)
    obs_valid = np.zeros((n_pts, L), bool)
    slot = np.zeros(n_pts, np.int32)
    dropped = 0
    for ci, pi, xy in zip(data["camera_index"], data["point_index"],
                          data["obs"]):
        s = slot[pi]
        if s >= L:
            dropped += 1
            continue
        obs_xy[pi, s] = xy
        obs_view[pi, s] = ci
        obs_valid[pi, s] = True
        slot[pi] = s + 1

    R = np.stack([np.asarray(se3.exp_so3(jnp.asarray(c[:3]))) for c in cams])
    t = cams[:, 3:6]
    intr = cams[:, 6:9]
    fixed = np.zeros(n_cam, bool)
    fixed[0] = True
    if dropped:
        import sys
        print(f"# bal.to_problem: dropped {dropped} observations beyond "
              f"max_obs_per_point={L}", file=sys.stderr)
    prob = ba.make_problem(R, t, pts, obs_xy, obs_view, obs_valid,
                           intr=intr, model="snavely", fixed_views=fixed)
    return prob


def write_bal(path: str, prob: ba.BAProblem) -> None:
    """BAProblem ('snavely') -> BAL text file."""
    R = np.asarray(prob.R)
    t = np.asarray(prob.t)
    intr = np.asarray(prob.intr)
    pts = np.asarray(prob.points)
    ov = np.asarray(prob.obs_view)
    oval = np.asarray(prob.obs_valid)
    oxy = np.asarray(prob.obs_xy)
    n_obs = int(oval.sum())
    with open(path, "w") as f:
        f.write(f"{R.shape[0]} {pts.shape[0]} {n_obs}\n")
        for p in range(pts.shape[0]):
            for s in range(ov.shape[1]):
                if oval[p, s]:
                    f.write(f"{ov[p, s]} {p} {oxy[p, s, 0]:.16e} "
                            f"{oxy[p, s, 1]:.16e}\n")
        for v in range(R.shape[0]):
            w = np.asarray(se3.log_so3(jnp.asarray(R[v])))
            for val in (*w, *t[v], *intr[v]):
                f.write(f"{val:.16e}\n")
        for p in range(pts.shape[0]):
            for val in pts[p]:
                f.write(f"{val:.16e}\n")
