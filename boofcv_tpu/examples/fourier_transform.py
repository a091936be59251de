"""Frequency-domain filtering with the discrete Fourier transform.

Reference analog: examples/imageprocessing/ExampleFourierTransform.java
— forward DFT, magnitude display, low-pass filtering by spectrum
multiplication.  Oracle: a Gaussian low-pass applied in the frequency
domain matches spatial Gaussian smoothing, and kills the injected
high-frequency stripe.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.ip import fft

    rng = np.random.default_rng(1)
    yy, xx = np.mgrid[0:96, 0:128].astype(np.float32)
    smooth = 100 + 40 * np.sin(xx / 17.0) * np.cos(yy / 23.0)
    stripe = 30 * np.sin(xx * 2.6)                 # high-frequency noise
    img = jnp.asarray(smooth + stripe)

    spec = fft.forward(img)
    mag = np.asarray(fft.magnitude(spec))
    transfer = fft.gaussian_lowpass_transfer(96, 128, sigma_frac=0.06)
    out = np.asarray(fft.filter_frequency(img, transfer))

    resid_smooth = np.abs(out - smooth)[8:-8, 8:-8]
    stripe_power_in = np.std(stripe)
    stripe_power_out = np.std((out - smooth)[8:-8, 8:-8])
    print(f"spectrum peak at DC: {bool(mag.argmax() == 0)}; "
          f"stripe std {stripe_power_in:.1f} -> {stripe_power_out:.1f} "
          f"after low-pass (median |out-smooth| "
          f"{np.median(resid_smooth):.2f})")
    ok = (mag.argmax() == 0 and stripe_power_out < 0.15 * stripe_power_in
          and np.median(resid_smooth) < 4.0)
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
