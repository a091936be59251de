"""BOW classification + TLD tracker oracles."""

import numpy as np
import jax
import jax.numpy as jnp

from boofcv_tpu.recognition import scene, tld


def test_kmeans_separates_clusters():
    rng = np.random.default_rng(0)
    a = rng.normal([0, 0], 0.3, (50, 2))
    b = rng.normal([5, 5], 0.3, (50, 2))
    pts = np.concatenate([a, b])
    centers = np.asarray(scene.kmeans(jax.random.PRNGKey(0), pts, 2))
    centers = centers[np.argsort(centers[:, 0])]
    np.testing.assert_allclose(centers[0], [0, 0], atol=0.3)
    np.testing.assert_allclose(centers[1], [5, 5], atol=0.3)


def test_bow_classification():
    rng = np.random.default_rng(1)
    # class 0: features near two modes A/B; class 1: near modes C/D
    modes = {0: ([0, 0], [3, 0]), 1: ([0, 3], [3, 3])}
    train_sets, labels = [], []
    for label, (m1, m2) in modes.items():
        for _ in range(6):
            f = np.concatenate([
                rng.normal(m1, 0.2, (20, 2)), rng.normal(m2, 0.2, (20, 2))])
            train_sets.append(f)
            labels.append(label)
    clf = scene.train_bow(jax.random.PRNGKey(1), train_sets, labels,
                          vocab_size=8, num_neighbors=3)
    correct = 0
    for label, (m1, m2) in modes.items():
        for _ in range(5):
            f = np.concatenate([
                rng.normal(m1, 0.2, (20, 2)), rng.normal(m2, 0.2, (20, 2))])
            correct += int(scene.classify_bow(clf, f) == label)
    assert correct >= 9


def _object_frame(rng, cy, cx, h=120, w=160):
    yy, xx = np.mgrid[0:h, 0:w]
    bg = rng.normal(100, 3, (h, w))
    # distinctive object whose texture moves WITH it (object-relative
    # coordinates) and is aperiodic
    u = yy - cy
    v = xx - cx
    obj = (np.abs(u) < 12) & (np.abs(v) < 12)
    tex = 50 * np.sign(np.sin(u * 0.9 + v * 0.31) + 0.4 * np.cos(v * 0.53)) \
        + 2.0 * u
    return (bg + np.where(obj, 70 + tex, 0)).astype(np.float32)


def test_tld_redetects_after_jump():
    rng = np.random.default_rng(2)
    t = tld.make_tracker()
    f0 = _object_frame(rng, 40, 50)
    t.initialize(f0, 40, 50, 24, 24)
    # object moves smoothly then jumps (simulating occlusion recovery)
    for (cy, cx) in [(44, 56), (48, 62), (80, 110)]:
        frame = _object_frame(rng, cy, cx)
        ok, box = t.process(frame)
        assert ok
        assert abs(box[0] - cy) < 6 and abs(box[1] - cx) < 6, (box, cy, cx)
