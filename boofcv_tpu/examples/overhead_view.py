"""Render an orthogonal overhead (bird's-eye) view of the ground plane.

Reference analog: examples/sfm/ExampleOverheadView.java —
CreateSyntheticOverheadView maps ground-plane cells through the camera
model.  Oracle: a square ground marking seen obliquely becomes square
(equal side lengths) in the overhead rendering.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.sfm import overhead_vo

    H, W, f = 160, 220, 180.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    # camera 1.4 m above the plane, pitched down 35 deg, looking +z
    pitch = np.radians(35)
    R_pc = np.array([[1, 0, 0],
                     [0, np.cos(pitch), -np.sin(pitch)],
                     [0, np.sin(pitch), np.cos(pitch)]])
    t_pc = np.array([0.0, 1.4, 0.0])
    # plane coordinates: X right, Z forward; a 1x1 m white square at
    # (x in [0.5, 1.5], z in [2.5, 3.5]) on dark ground
    def ground_color(px, pz):
        return np.where((np.abs(px - 1.0) < 0.5)
                        & (np.abs(pz - 3.0) < 0.5), 220.0, 40.0)

    # render the oblique camera image by ray-plane intersection
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    rays = np.stack([(xs - W / 2) / f, (ys - H / 2) / f,
                     np.ones_like(xs)], -1)
    d_w = rays @ R_pc                      # camera ray in plane frame
    # plane y=0; camera center at (0, -1.4?, 0): X_p = c + s * d
    c = -R_pc.T @ t_pc
    s = -c[1] / np.where(np.abs(d_w[..., 1]) < 1e-9, 1e-9, d_w[..., 1])
    Xp = c[None, None] + s[..., None] * d_w
    img = np.where(s > 0, ground_color(Xp[..., 0], Xp[..., 2]),
                   10.0).astype(np.float32)

    omap = overhead_vo.create_overhead_map(
        K, R_pc, t_pc, H, W, oh=250, ow=200, cell=0.02,
        center_x=-1.0, center_z=1.0)
    over = np.asarray(overhead_vo.render_overhead(jnp.asarray(img), omap))

    bright = over > 150
    if not bright.any():
        print("FAILED (no marking)")
        return 1
    ys_b, xs_b = np.nonzero(bright)
    h_ext = ys_b.max() - ys_b.min() + 1
    w_ext = xs_b.max() - xs_b.min() + 1
    fill = bright.sum() / (h_ext * w_ext)
    print(f"overhead marking extent {w_ext} x {h_ext} cells "
          f"(aspect {w_ext / h_ext:.2f}, fill {fill:.2f}); expected a "
          f"filled square of ~50 cells at 2 cm/cell")
    ok = 0.85 < w_ext / h_ext < 1.18 and fill > 0.8 \
        and abs(h_ext - 50) < 8
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
