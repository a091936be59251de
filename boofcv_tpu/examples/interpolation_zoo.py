"""Pixel interpolation methods compared on upsampling.

Reference analog: examples/imageprocessing/ExampleInterpolation.java —
nearest / bilinear / bicubic sampling of the same image.  Oracle: on a
smooth analytic image, bicubic beats bilinear beats nearest in
reconstruction error.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.ip import interpolate

    def f(y, x):
        return 100 + 60 * np.sin(x / 6.5) * np.cos(y / 5.0)

    ys, xs = np.mgrid[0:48, 0:64].astype(np.float64)
    img = jnp.asarray(f(ys, xs).astype(np.float32))
    # sample at a 4x denser off-grid lattice
    qy, qx = np.mgrid[4:43:0.25, 4:59:0.25]
    truth = f(qy, qx)
    qyj = jnp.asarray(qy.ravel(), jnp.float32)
    qxj = jnp.asarray(qx.ravel(), jnp.float32)

    errs = {}
    for name, fn in (("nearest", interpolate.nearest),
                     ("bilinear", interpolate.bilinear),
                     ("bicubic", interpolate.bicubic)):
        v = np.asarray(fn(img, qyj, qxj)).reshape(truth.shape)
        errs[name] = float(np.abs(v - truth).mean())
        print(f"{name:9s} mean |err| {errs[name]:.4f}")
    ok = errs["bicubic"] < errs["bilinear"] < errs["nearest"] \
        and errs["bicubic"] < 0.2
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
