"""Dense HOG features for whole-image description.

Reference analog: examples/features/ExampleDenseImageFeatures.java —
a regular grid of HOG block descriptors.  Oracle: descriptors from a
vertically-striped region are dominated by vertical-edge orientation
bins; a texture-matched query region ranks its own patch first.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.feature import dense

    rng = np.random.default_rng(0)
    img = np.zeros((96, 128), np.float32)
    xx = np.arange(128)[None, :]
    yy = np.arange(96)[:, None]
    img[:, :64] = 120 + 80 * np.sign(np.sin(xx[:, :64] * 1.2))  # vertical
    img[:48, 64:] = 120 + 80 * np.sign(np.sin(yy[:48] * 1.2))   # horizontal
    img[48:, 64:] = 120.0                                       # flat
    img += rng.normal(0, 2.0, img.shape)

    desc = np.asarray(dense.hog(jnp.asarray(img), cell_size=8,
                                block_cells=2, num_bins=9))
    by, bx, d = desc.shape
    print(f"HOG grid: {by}x{bx} blocks x {d}-D")

    # vertical stripes -> gradient along x -> orientation bin near 0
    v_block = desc[5, 2].reshape(4, 9).mean(0)
    h_block = desc[2, 10].reshape(4, 9).mean(0)
    v_peak = int(np.argmax(v_block))
    h_peak = int(np.argmax(h_block))
    print(f"vertical-stripe peak bin {v_peak}, horizontal-stripe "
          f"peak bin {h_peak} (9 bins over 180 deg)")
    # the two textures must peak in clearly different orientation bins
    sep = min(abs(v_peak - h_peak), 9 - abs(v_peak - h_peak))
    flat_energy = np.linalg.norm(desc[10, 12])
    ok = sep >= 3 and np.linalg.norm(v_block) > 0.1 \
        and flat_energy < np.linalg.norm(desc[5, 2])
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
