"""Convolution: 1D separable, 2D, and edge-renormalized variants.

Reference analog: examples/imageprocessing/ExampleConvolution.java —
horizontal/vertical 1D kernels, full 2D kernels, normalized borders.
Oracle: separable Gaussian equals the equivalent 2D kernel; normalized
borders keep a constant image constant.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.core.border import BorderType
    from boofcv_tpu.core.kernel import gaussian_kernel
    from boofcv_tpu.ip import convolve

    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.uniform(0, 255, (48, 64)).astype(np.float32))

    k1 = gaussian_kernel(sigma=1.5)
    sep = convolve.separable(img, k1, k1, BorderType.EXTENDED)
    k2 = jnp.outer(k1, k1)
    full = convolve.convolve2d(img, k2, BorderType.EXTENDED)
    err_sep = float(jnp.abs(sep - full).max())

    # normalized border: a constant image stays exactly constant
    const = jnp.full((32, 40), 77.0, jnp.float32)
    normed = convolve.separable(const, k1, k1, BorderType.NORMALIZED)
    err_norm = float(jnp.abs(normed - 77.0).max())

    # horizontal derivative kernel responds to a vertical edge only
    d = jnp.asarray([-1.0, 0.0, 1.0])
    edge = jnp.zeros((30, 40), jnp.float32).at[:, 20:].set(100.0)
    h_resp = convolve.horizontal(edge, d, BorderType.EXTENDED)
    v_resp = convolve.vertical(edge, d, BorderType.EXTENDED)
    print(f"separable-vs-2D max err {err_sep:.2e}; normalized-border "
          f"constancy err {err_norm:.2e}; edge response h "
          f"{float(jnp.abs(h_resp).max()):.0f} / v "
          f"{float(jnp.abs(v_resp).max()):.0f}")
    ok = (err_sep < 1e-3 and err_norm < 1e-3
          and float(jnp.abs(h_resp).max()) > 50
          and float(jnp.abs(v_resp).max()) < 1e-3)
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
