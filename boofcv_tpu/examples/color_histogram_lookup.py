"""Find images with similar color content via color histograms.

Reference analog: examples/imageprocessing/ExampleColorHistogramLookup.java
— images are summarized as (coupled) hue-saturation histograms and ranked
by histogram distance against a query.  Multi-band processing rides the
``ip.planar`` vmap-over-bands layer; the 2-D histogram is one scatter-add.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.ip import blur, color, planar

    rng = np.random.default_rng(11)

    def patch(base_rgb, seed):
        r = np.random.default_rng(seed)
        img = np.tile(np.asarray(base_rgb, np.float32), (48, 64, 1))
        img += r.normal(0, 12, img.shape)
        return jnp.asarray(np.clip(img, 0, 255))

    bases = [(200, 40, 40), (40, 180, 60), (50, 70, 210),
             (210, 200, 60), (140, 60, 160)]
    gallery = [patch(b, i) for i, b in enumerate(bases)]
    # planar blur (one vmapped dispatch over the 3 bands)
    gallery = [planar.planar(blur.gaussian)(g, sigma=1.5) for g in gallery]

    def hs_hist(img, nb=12):
        h, s, v = [jnp.asarray(c) for c in
                   np.moveaxis(np.asarray(color.rgb_to_hsv(img / 255.0)),
                               -1, 0)]
        hb = jnp.clip((h / (2 * np.pi) * nb).astype(jnp.int32), 0, nb - 1)
        sb = jnp.clip((s * nb).astype(jnp.int32), 0, nb - 1)
        flat = (hb * nb + sb).ravel()
        hist = jnp.zeros((nb * nb,), jnp.float32).at[flat].add(1.0)
        return hist / jnp.sum(hist)

    hists = jnp.stack([hs_hist(g) for g in gallery])
    correct = 0
    for q in range(len(bases)):
        query = planar.planar(blur.gaussian)(
            patch(bases[q], 100 + q), sigma=1.5)
        qh = hs_hist(query)
        d = jnp.sum(jnp.abs(hists - qh[None]), axis=1)   # L1 distance
        best = int(jnp.argmin(d))
        correct += best == q
    print(f"query->gallery matches: {correct}/{len(bases)}")
    ok = correct == len(bases)
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
