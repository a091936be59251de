"""Track an object with scale-adaptive mean-shift (Comaniciu 2003).

Reference analog: examples/tracking/ExampleTrackerMeanShiftLikelihood /
TrackerMeanShiftComaniciu2003 — histogram-similarity mean-shift with a
three-scale search.  Oracle: a bright textured disk moving and growing
across frames stays locked within a few pixels and the region grows.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.feature import trackers

    rng = np.random.default_rng(8)

    def frame(cy, cx, r):
        img = rng.normal(60, 4, (120, 160)).astype(np.float32)
        yy, xx = np.mgrid[0:120, 0:160]
        d2 = (yy - cy) ** 2 + (xx - cx) ** 2
        disk = d2 < r * r
        img[disk] = 190 + 25 * np.sin((yy[disk] - cy) * 0.4)
        return img

    path = [(40 + 3 * i, 40 + 5 * i, 14 * (1 + 0.04 * i))
            for i in range(9)]
    st = trackers.comaniciu_init(jnp.asarray(frame(*path[0])), path[0][0],
                                 path[0][1], path[0][2], path[0][2])
    errs = []
    for cy, cx, r in path[1:]:
        st = trackers.comaniciu_track(st, jnp.asarray(frame(cy, cx, r)),
                                      scale_change=0.1)
        errs.append(np.hypot(float(st.cy) - cy, float(st.cx) - cx))
    grew = float(st.ry) > path[0][2] * 1.1
    print(f"frames: {len(path)}, final center error {errs[-1]:.1f} px, "
          f"region half-size {float(st.ry):.1f} (start {path[0][2]}, "
          f"true {path[-1][2]:.1f})")
    ok = errs[-1] < 5.0 and max(errs) < 8.0 and grew
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
