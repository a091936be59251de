"""Track a user-selected object through a video sequence.

Reference analog: examples/tracking/ExampleTrackerObjectQuad.java — the
unified object-tracker interface (TLD / circulant / mean-shift).  A
textured object translates across a noisy background; each tracker's
reported box center is checked against the known trajectory.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def _frame(rng_seed, cy, cx, h=120, w=160):
    rng = np.random.default_rng(rng_seed)
    yy, xx = np.mgrid[0:h, 0:w]
    bg = rng.normal(100, 3, (h, w))
    u = yy - cy
    v = xx - cx
    obj = (np.abs(u) < 12) & (np.abs(v) < 12)
    tex = 50 * np.sign(np.sin(u * 0.9 + v * 0.31) + 0.4 * np.cos(v * 0.53)) \
        + 2.0 * u
    return (bg + np.where(obj, 70 + tex, 0)).astype(np.float32)


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.feature import trackers
    from boofcv_tpu.recognition import tld

    path = [(40, 50), (43, 56), (46, 62), (49, 68), (52, 74)]
    ok_all = True

    # TLD
    t = tld.make_tracker()
    t.initialize(_frame(0, *path[0]), path[0][0], path[0][1], 24, 24)
    err = 0.0
    for cy, cx in path[1:]:
        ok, box = t.process(_frame(0, cy, cx))
        err = max(abs(box[0] - cy), abs(box[1] - cx)) if ok else 99.0
    print(f"tld      : final center error {err:.1f} px")
    ok_all &= err < 5

    # circulant (FFT correlation filter)
    st = trackers.circulant_init(jnp.asarray(_frame(0, *path[0])),
                                 path[0][0], path[0][1], size=48)
    for cy, cx in path[1:]:
        st = trackers.circulant_track(st, jnp.asarray(_frame(0, cy, cx)))
    err = max(abs(float(st.cy) - path[-1][0]),
              abs(float(st.cx) - path[-1][1]))
    print(f"circulant: final center error {err:.1f} px")
    ok_all &= err < 5

    print("OK" if ok_all else "FAILED")
    return 0 if ok_all else 1


if __name__ == "__main__":
    raise SystemExit(main())
