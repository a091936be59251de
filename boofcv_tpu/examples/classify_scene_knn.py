"""Scene classification with a bag-of-visual-words + KNN classifier.

Reference analog: examples/recognition/ExampleClassifySceneKnn.java —
dense features -> k-means vocabulary -> word histograms -> KNN.  Three
synthetic texture classes (smooth, stripes, checkers) are learned from
training images and classified on held-out views.
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def _texture(rng, kind, n=64):
    yy, xx = np.mgrid[0:n, 0:n]
    if kind == 0:        # smooth gradient
        img = 0.8 * xx + 0.4 * yy + rng.normal(0, 2, (n, n))
    elif kind == 1:      # stripes
        img = 120 + 90 * np.sin(xx * (0.5 + 0.1 * rng.random()))
    else:                # checkers
        s = rng.integers(6, 9)
        img = 120 + 90 * (((yy // s) + (xx // s)) % 2) \
            + rng.normal(0, 3, (n, n))
    return img.astype(np.float32)


def main(argv=None) -> int:
    setup_backend(argv)
    import jax
    import numpy as _np
    from boofcv_tpu.feature import dense
    from boofcv_tpu.recognition import scene

    rng = np.random.default_rng(19)

    def feats(img):
        _, _, d = dense.dense_sift(img, cell=8, step=8)
        return _np.asarray(d)

    train_sets, train_labels = [], []
    for kind in range(3):
        for _ in range(6):
            train_sets.append(feats(_texture(rng, kind)))
            train_labels.append(kind)
    clf = scene.train_bow(jax.random.PRNGKey(0), train_sets, train_labels,
                          vocab_size=24)

    correct = total = 0
    for kind in range(3):
        for _ in range(4):
            pred = int(scene.classify_bow(clf, feats(_texture(rng, kind))))
            correct += int(pred == kind)
            total += 1
    print(f"held-out accuracy: {correct}/{total}")
    ok = correct >= int(0.8 * total)
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
