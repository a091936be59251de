"""SURF: Fast-Hessian detection + orientation + 64-D description.

Reference analog: examples/features/ExampleFeatureSurf.java — detect
scale-space blobs on the integral image, assign orientation, describe.
Oracle: descriptors of the same scene re-match under a rotation+shift,
and detected scales track the rendered blob sizes.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax.numpy as jnp
    from boofcv_tpu.ip import integral as ii_ops, distort
    from boofcv_tpu.feature import fasthessian, describe, associate

    rng = np.random.default_rng(4)
    # asymmetric band-limited texture: radially symmetric blobs would
    # leave the SURF orientation undefined and break the rotation check
    from scipy.ndimage import gaussian_filter
    img = gaussian_filter(rng.normal(0, 1, (200, 240)), 3.0)
    img = (120 + 60 * img / img.std()).astype(np.float32)

    def detdesc(image):
        ii = ii_ops.transform(jnp.asarray(image))
        det = fasthessian.detect_multi_octave(
            ii, max_features_per_octave=40, num_octaves=2)
        ang = describe.orientation_average_haar(ii, det.ys, det.xs,
                                                det.scales)
        d = describe.surf(ii, det.ys, det.xs, det.scales, ang)
        return det, d

    det1, d1 = detdesc(img)
    n1 = int(np.asarray(det1.valid).sum())

    # rotate + shift the scene and re-match
    rot = np.asarray(distort.rotate(jnp.asarray(img), 0.35))
    det2, d2 = detdesc(rot)
    s = associate.score_euclidean_sq(d1, d2)
    big = 1e12
    s = jnp.where(jnp.asarray(det1.valid)[:, None], s, big)
    s = jnp.where(jnp.asarray(det2.valid)[None, :], s, big)
    m = associate.associate_mutual(s, max_error=0.25)
    nm = int(np.asarray(m.valid).sum())
    print(f"features: {n1} / {int(np.asarray(det2.valid).sum())}; "
          f"rotation-invariant matches: {nm}")
    ok = n1 >= 5 and nm >= 4
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
