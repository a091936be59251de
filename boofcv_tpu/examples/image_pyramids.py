"""Discrete and float-scale image pyramids.

Reference analog: examples/imageprocessing/ExamplePyramidDiscrete.java +
ExamplePyramidFloat.java — blur-and-decimate octave pyramids and
Gaussian scale space.  Oracle: level shapes halve per octave; energy is
preserved at low frequencies and fine detail is progressively removed.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.core.pyramid import PyramidConfig
    from boofcv_tpu.ip import pyramid_ops

    rng = np.random.default_rng(2)
    yy, xx = np.mgrid[0:128, 0:160].astype(np.float32)

    def coarse(y, x):
        return 120 + 50 * np.sin(x / 19.0)

    fine = 25 * np.sin(xx * 1.9) * np.cos(yy * 2.1)
    img = jnp.asarray(coarse(yy, xx) + fine
                      + rng.normal(0, 1, (128, 160)).astype(np.float32))

    cfg = PyramidConfig(scales=(1, 2, 4, 8))
    pyr = pyramid_ops.pyramid_discrete(img, cfg)
    shapes = [tuple(p.shape) for p in pyr]
    print(f"discrete pyramid shapes: {shapes}")

    # residual vs the analytic COARSE image sampled at each level's
    # grid: the fine carrier must vanish up the pyramid while the
    # coarse sinusoid survives
    resid = []
    for k, p in enumerate(pyr):
        s = cfg.scales[k]
        hy, hx = np.mgrid[0:p.shape[0], 0:p.shape[1]].astype(np.float32)
        resid.append(float(np.std(np.asarray(p)
                                  - coarse(hy * s, hx * s))))
    print(f"per-level fine residual std: {[round(v, 2) for v in resid]}")

    gss = pyramid_ops.gaussian_scale_space(img, sigmas=(1.0, 2.0, 4.0))
    coarse_ok = np.asarray(gss[-1]).std() > 20       # coarse wave survives
    ok = (shapes == [(128, 160), (64, 80), (32, 40), (16, 20)]
          and resid[0] > 3 * resid[2] and resid[2] < 7 and coarse_ok)
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
