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


def test_deepboof_vgg_forward_and_overfit():
    import jax
    import jax.numpy as jnp
    from boofcv_tpu.recognition import deepboof
    key = jax.random.PRNGKey(0)
    params = deepboof.init_vgg_cifar10(key)
    x = jax.random.uniform(jax.random.PRNGKey(1), (4, 32, 32, 3))
    logits = deepboof.vgg_cifar10_forward(params, x)
    assert logits.shape == (4, 10)
    # trainability smoke test: a few SGD steps must drive the loss down
    y = jnp.asarray([0, 1, 2, 3])

    def loss_fn(p):
        lg = deepboof.vgg_cifar10_forward(p, x)
        return -jnp.mean(jax.nn.log_softmax(lg)[jnp.arange(4), y])

    l0 = float(loss_fn(params))
    g = jax.jit(jax.grad(loss_fn))
    for _ in range(12):
        grads = g(params)
        params = {k: params[k] - 0.003 * grads[k] for k in params}
    l1 = float(loss_fn(params))
    assert l1 < l0 * 0.8, (l0, l1)


def test_deepboof_classifier_wrapper(tmp_path):
    import numpy as np
    from boofcv_tpu.recognition import deepboof
    clf = deepboof.ImageClassifierVggCifar10()
    img = np.random.default_rng(0).uniform(0, 255, (32, 32, 3))
    s = clf.scores(img)
    assert s.shape == (1, 10)
    assert abs(s.sum() - 1.0) < 1e-5
    c = clf.classify(img)
    assert 0 <= c < 10
    # params round-trip
    p = str(tmp_path / "w.npz")
    deepboof.save_params(p, clf.params)
    clf2 = deepboof.ImageClassifierVggCifar10(deepboof.load_params(p))
    assert clf2.classify(img) == c


def test_deepboof_nin_forward():
    import jax
    from boofcv_tpu.recognition import deepboof
    params = deepboof.init_nin(jax.random.PRNGKey(2), num_classes=12,
                               channels=(16, 24, 32))
    x = jax.random.uniform(jax.random.PRNGKey(3), (2, 64, 64, 3))
    logits = deepboof.nin_forward(params, x, channels=(16, 24, 32))
    assert logits.shape == (2, 12)


def test_profiling_utils():
    import numpy as np
    from boofcv_tpu.utils.profiling import MovingAverage, StageTimer
    ma = MovingAverage(0.9)
    ma.update(10.0)
    v = ma.update(20.0)
    assert abs(v - 11.0) < 1e-9
    t = StageTimer()
    with t.stage("a"):
        _ = np.zeros(10)
    rep = t.report()
    assert "a" in rep and rep["a"] >= 0.0


def test_tld_median_flow_tracks_smooth_motion():
    """The tracking component (median flow + FB validation) must follow
    smooth motion even when the detector is disabled (its grid/scale
    quantization would otherwise limit accuracy)."""
    rng = np.random.default_rng(5)
    t = tld.make_tracker()
    f0 = _object_frame(rng, 40, 50)
    t.initialize(f0, 40, 50, 24, 24)
    # make the detection cascade abstain so only tracking can answer
    t.cfg.ncc_confirm = 1.01
    path = [(42, 53), (44, 56), (46, 59), (48, 62)]
    for cy, cx in path:
        ok, box = t.process(_object_frame(rng, cy, cx))
        assert ok
        assert abs(box[0] - cy) < 2.5 and abs(box[1] - cx) < 2.5, \
            (box[:2], (cy, cx))


def _object_frame_scaled(rng, cy, cx, scale, h=120, w=160):
    """Object texture in object-relative coordinates, magnified by
    ``scale`` (the same surface seen closer/farther)."""
    yy, xx = np.mgrid[0:h, 0:w]
    bg = rng.normal(100, 3, (h, w))
    u = (yy - cy) / scale
    v = (xx - cx) / scale
    obj = (np.abs(u) < 12) & (np.abs(v) < 12)
    tex = 50 * np.sign(np.sin(u * 0.9 + v * 0.31) + 0.4 * np.cos(v * 0.53)) \
        + 2.0 * u
    return (bg + np.where(obj, 70 + tex, 0)).astype(np.float32)


def test_tld_reacquires_after_large_scale_change():
    """The full-scale-pyramid detector (round 4) must reacquire the
    target when it reappears ~1.7x larger elsewhere — outside the old
    +-25% around-current-size search."""
    rng = np.random.default_rng(5)
    t = tld.make_tracker()
    f0 = _object_frame_scaled(rng, 40, 50, 1.0)
    t.initialize(f0, 40, 50, 24, 24)
    for (cy, cx) in [(43, 55), (46, 60)]:
        t.process(_object_frame_scaled(rng, cy, cx, 1.0))
    # occlusion: object gone for two frames
    for _ in range(2):
        t.process(rng.normal(100, 3, (120, 160)).astype(np.float32))
    # reappears larger and far away
    ok = False
    for _ in range(3):
        frame = _object_frame_scaled(rng, 78, 112, 1.7)
        ok, box = t.process(frame)
        if ok:
            break
    assert ok, "never reacquired"
    assert abs(box[0] - 78) < 8 and abs(box[1] - 112) < 8, box
    assert 1.3 * 24 < box[2] < 2.2 * 24, box
