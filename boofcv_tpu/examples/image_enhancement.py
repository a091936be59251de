"""Image enhancement: histogram equalization, sharpening, wavelet denoise.

Reference analogs: examples/enhance/ExampleImageEnhancement.java and
ExampleWaveletDenoise.java.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.ip import enhance, wavelet
    from boofcv_tpu.io import simulate

    rng = np.random.default_rng(16)
    # noise_texture is already ~[0, 255]; compress to a low-contrast band
    base = simulate.noise_texture(rng, size=160, octaves=4) * 0.25 + 96.0
    img = jnp.asarray(base[:128, :128], jnp.float32)

    # equalization stretches a low-contrast image to the full range
    eq = np.asarray(enhance.equalize_histogram(img))
    print(f"equalize: input range [{float(img.min()):.0f}, "
          f"{float(img.max()):.0f}] -> [{eq.min():.0f}, {eq.max():.0f}]")
    ok = eq.max() - eq.min() > 1.8 * (float(img.max()) - float(img.min()))

    # sharpen increases local gradient energy
    sh = np.asarray(enhance.sharpen4(img))
    g0 = np.abs(np.diff(np.asarray(img), axis=1)).mean()
    g1 = np.abs(np.diff(sh, axis=1)).mean()
    print(f"sharpen4: mean |gradient| {g0:.2f} -> {g1:.2f}")
    ok &= g1 > g0

    # wavelet denoising removes most of an added-noise layer
    noisy = img + jnp.asarray(rng.normal(0, 12, img.shape), jnp.float32)
    den = np.asarray(wavelet.denoise_bayes(noisy, levels=3))
    e_noisy = float(jnp.sqrt(jnp.mean((noisy - img) ** 2)))
    e_den = float(np.sqrt(np.mean((den - np.asarray(img)) ** 2)))
    print(f"wavelet denoise (BayesShrink): RMSE {e_noisy:.1f} -> {e_den:.1f}")
    ok &= e_den < 0.7 * e_noisy
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
