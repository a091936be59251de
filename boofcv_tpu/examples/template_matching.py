"""Find a template inside an image.

Reference analog: examples/features/ExampleTemplateMatching.java —
SSD/NCC template search, peak = object location.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.feature import template
    from boofcv_tpu.io import simulate

    rng = np.random.default_rng(18)
    scene = simulate.noise_texture(rng, size=200, octaves=5)[:150, :200]
    ty, tx = 58, 117
    tmpl = scene[ty:ty + 15, tx:tx + 21].copy()
    noisy = (scene + rng.normal(0, 2, scene.shape)).astype(np.float32)

    ok = True
    for name, fn in [("ssd", template.match_ssd),
                     ("sad", template.match_sad),
                     ("ncc", template.match_ncc)]:
        # all score maps are higher-is-better (SSD/SAD are negated)
        score = np.asarray(fn(jnp.asarray(noisy), jnp.asarray(tmpl)))
        py, px = np.unravel_index(np.argmax(score), score.shape)
        err = max(abs(py - ty), abs(px - tx))
        print(f"{name}: peak at ({py}, {px}), true ({ty}, {tx}), err {err}")
        ok &= err <= 1
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
