"""Dense optical flow between two frames.

Reference analog: examples/features/ExampleDenseOpticalFlow.java —
pyramidal Horn-Schunck / Brox / dense-KLT flow.  The second frame is the
first shifted by a known sub-image offset, so the recovered flow field
is checked against ground truth.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.feature import flow
    from boofcv_tpu.io import simulate

    rng = np.random.default_rng(4)
    tex = simulate.noise_texture(rng, size=220, octaves=5)
    dy, dx = 3, 5
    im1 = jnp.asarray(tex[:160, :160], jnp.float32)
    im2 = jnp.asarray(tex[dy:160 + dy, dx:160 + dx], jnp.float32)
    # im2[p] = im1[p + (dy, dx)] => content moves by (-dy, -dx): the
    # ground-truth flow is (u, v) = (-dx, -dy)

    ok = True
    for name, fn in [
        ("horn_schunck_pyr", lambda: flow.horn_schunck_pyramid(
            im1, im2, alpha=0.5, iterations=60)),
        ("dense_klt", lambda: flow.dense_klt(im1, im2, radius=3)),
        ("block_flow", lambda: flow.block_flow(im1, im2, search_radius=8)),
    ]:
        out = fn()
        u, v = out[0], out[1]
        c = np.s_[30:-30, 30:-30]  # interior (borders have no data)
        mu = float(np.median(np.asarray(u)[c]))
        mv = float(np.median(np.asarray(v)[c]))
        err = max(abs(mu + dx), abs(mv + dy))
        this_ok = err < 0.7
        ok &= this_ok
        print(f"{name:16s}: median flow ({mu:+.2f}, {mv:+.2f}) "
              f"expected ({-dx:+d}, {-dy:+d})  err {err:.2f}")
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
