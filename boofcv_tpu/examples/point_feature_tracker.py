"""Track point features through an image sequence (pyramidal KLT).

Reference analog: examples/tracking/ExamplePointFeatureTracker.java —
PointTracker detect/track/spawn over a video.  The sequence is a texture
sliding by a known per-frame offset; median track motion is checked.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.feature import point_tracker
    from boofcv_tpu.io import simulate

    rng = np.random.default_rng(8)
    tex = simulate.noise_texture(rng, size=320, octaves=5)
    dy, dx = 2, 3
    frames = [tex[i * dy:i * dy + 180, i * dx:i * dx + 240].astype(np.float32)
              for i in range(6)]

    tracker = point_tracker.PointTrackerKlt(max_tracks=256,
                                            scales=(1, 2, 4))
    tracker.process(jnp.asarray(frames[0]))
    tracker.spawn()
    prev = {t.uid: (t.y, t.x) for t in tracker.active_tracks()}
    total = drifted = 0
    for i, f in enumerate(frames[1:], 1):
        tracker.process(jnp.asarray(f))
        cur = {t.uid: (t.y, t.x) for t in tracker.active_tracks()}
        moves = [(cur[u][0] - prev[u][0], cur[u][1] - prev[u][1])
                 for u in cur if u in prev]
        m = np.asarray(moves)
        total += len(m)
        # content slides by (-dy, -dx) per frame
        drifted += int(np.sum(np.abs(m + [dy, dx]).max(1) > 0.5))
        print(f"frame {i}: {len(cur)} active tracks, median motion "
              f"({np.median(m[:, 0]):+.2f}, {np.median(m[:, 1]):+.2f}) "
              f"expected ({-dy}, {-dx})")
        prev = cur
    frac = drifted / max(total, 1)
    print(f"drifting track fraction: {frac:.3f}")
    ok = total > 400 and frac < 0.1
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
