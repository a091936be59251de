"""SIFT + dense descriptor oracles."""

import numpy as np
import jax.numpy as jnp

from boofcv_tpu.feature import sift, dense, associate


def blob_image(rng, n_blobs=10, h=120, w=160, seed_pos=None):
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w), np.float32)
    pos = seed_pos if seed_pos is not None else np.stack(
        [rng.uniform(20, h - 20, n_blobs), rng.uniform(20, w - 20, n_blobs)], 1)
    for (cy, cx) in pos:
        s = 3.0
        img += 200 * np.exp(-0.5 * (((yy - cy) / s) ** 2 + ((xx - cx) / s) ** 2))
    return img + rng.normal(0, 1, img.shape).astype(np.float32), pos


def test_sift_detects_blobs():
    rng = np.random.default_rng(0)
    img, pos = blob_image(rng)
    kp = sift.detect(jnp.asarray(img), max_features=10,
                     contrast_threshold=5.0)
    found = np.stack([np.asarray(kp.ys)[np.asarray(kp.valid)],
                      np.asarray(kp.xs)[np.asarray(kp.valid)]], 1)
    assert len(found) >= 8
    d = np.linalg.norm(found[:, None] - pos[None], axis=-1).min(1)
    assert (d < 2.5).mean() >= 0.8


def test_sift_descriptor_rotation_consistency():
    """The same local pattern rotated -> similar descriptor after the
    orientation assignment."""
    rng = np.random.default_rng(1)
    h = w = 96
    yy, xx = np.mgrid[0:h, 0:w]
    # anisotropic blob => strong dominant orientation
    def render(theta):
        c, s = np.cos(theta), np.sin(theta)
        u = c * (xx - w / 2) + s * (yy - h / 2)
        v = -s * (xx - w / 2) + c * (yy - h / 2)
        return (200 * np.exp(-0.5 * ((u / 12) ** 2 + (v / 4) ** 2))
                ).astype(np.float32)

    img0 = render(0.0)
    img1 = render(0.7)
    ys = jnp.asarray([h / 2.0]); xs = jnp.asarray([w / 2.0])
    sg = jnp.asarray([3.0])
    a0 = sift.orientation_histogram(jnp.asarray(img0), ys, xs, sg)
    a1 = sift.orientation_histogram(jnp.asarray(img1), ys, xs, sg)
    d0 = sift.describe(jnp.asarray(img0), ys, xs, sg, a0)
    d1 = sift.describe(jnp.asarray(img1), ys, xs, sg, a1)
    cos = float(jnp.sum(d0 * d1))
    assert cos > 0.9, cos


def test_sift_matching_across_translation():
    rng = np.random.default_rng(2)
    img, pos = blob_image(rng)
    big = np.zeros((140, 180), np.float32)
    big[7:127, 11:171] = img
    kp0, d0 = sift.detect_describe(jnp.asarray(img), max_features=10)
    kp1, d1 = sift.detect_describe(jnp.asarray(big), max_features=10)
    scores = associate.score_euclidean_sq(d0, d1)
    m = associate.associate_mutual(scores, max_error=0.5)
    src = np.asarray(m.src)[np.asarray(m.valid)]
    dst = np.asarray(m.dst)[np.asarray(m.valid)]
    assert len(src) >= 6
    dy = np.asarray(kp1.ys)[dst] - np.asarray(kp0.ys)[src]
    dx = np.asarray(kp1.xs)[dst] - np.asarray(kp0.xs)[src]
    assert abs(np.median(dy) - 7) < 1.0
    assert abs(np.median(dx) - 11) < 1.0


def test_hog_shapes_and_edge_response():
    img = np.zeros((64, 64), np.float32)
    img[:, 32:] = 200  # vertical edge -> horizontal gradient
    blocks = np.asarray(dense.hog(img, cell_size=8, block_cells=2,
                                  num_bins=9))
    assert blocks.shape == (7, 7, 36)
    # blocks covering the edge: dominant bin should be the horizontal-
    # gradient bin (angle 0 => bin around 0)
    mid = blocks[3, 3].reshape(4, 9)
    assert mid.sum() > 0
    dom = mid.sum(0).argmax()
    assert dom in (0, 8)  # wrap-adjacent bins of angle~0


def test_dense_sift_grid():
    rng = np.random.default_rng(3)
    img, _ = blob_image(rng)
    ys, xs, desc = dense.dense_sift(img, cell=8, step=16)
    assert desc.shape[1] == 128
    assert ys.shape[0] == desc.shape[0] > 10
    norms = np.linalg.norm(np.asarray(desc), axis=1)
    assert np.all(norms < 1.2)


def test_sift_multi_octave_4x_scale_matching():
    """The octave ladder must carry features across a 4x scale change
    (SiftScaleSpace.java:51 parity) — the single-octave detector tops
    out around 2x."""
    rng = np.random.default_rng(4)
    n = 10
    pos = np.stack([rng.uniform(24, 104, n), rng.uniform(24, 104, n)], 1)
    sgn = rng.choice([-1.0, 1.0], n)

    def render(scale, h, w, sigma):
        yy, xx = np.mgrid[0:h, 0:w]
        img = np.zeros((h, w), np.float32)
        for (cy, cx), s in zip(pos * scale, sgn):
            img += s * 200 * np.exp(
                -0.5 * (((yy - cy) / sigma) ** 2 + ((xx - cx) / sigma) ** 2))
        return img + rng.normal(0, 0.5, img.shape).astype(np.float32)

    img1 = render(1.0, 128, 128, 2.0)
    img2 = render(4.0, 512, 512, 8.0)
    kp1, d1 = sift.detect_describe(jnp.asarray(img1), max_features=16,
                                   contrast_threshold=3.0, num_octaves=4)
    kp2, d2 = sift.detect_describe(jnp.asarray(img2), max_features=16,
                                   contrast_threshold=3.0, num_octaves=4)
    v1 = np.asarray(kp1.valid)
    v2 = np.asarray(kp2.valid)
    scores = associate.score_euclidean_sq(d1, d2)
    # mask dead slots out of the association
    scores = jnp.where(jnp.asarray(v1)[:, None] & jnp.asarray(v2)[None, :],
                       scores, jnp.inf)
    m = associate.associate_mutual(scores, max_error=0.6)
    src = np.asarray(m.src)[np.asarray(m.valid)]
    dst = np.asarray(m.dst)[np.asarray(m.valid)]
    y1 = np.asarray(kp1.ys)[src]
    x1 = np.asarray(kp1.xs)[src]
    y2 = np.asarray(kp2.ys)[dst]
    x2 = np.asarray(kp2.xs)[dst]
    err = np.hypot(y2 - 4 * y1, x2 - 4 * x1)
    good = err < 6.0
    # >=80% of the true blobs recovered as correct cross-scale matches
    hits = set()
    for (gy, gx) in zip(y1[good], x1[good]):
        d = np.linalg.norm(pos - [gy, gx], axis=1)
        if d.min() < 4.0:
            hits.add(int(d.argmin()))
    assert len(hits) >= 8, (len(hits), len(src), int(good.sum()))
    # sigma spans the octave range: matched img2 keypoints are ~4x bigger
    sg1 = np.asarray(kp1.sigmas)[src][good]
    sg2 = np.asarray(kp2.sigmas)[dst][good]
    ratio = np.median(sg2 / sg1)
    assert 2.5 < ratio < 6.5, ratio


def test_sift_first_octave_minus_one_small_features():
    """sigma~2 blobs sit on octave 0's scale-axis boundary (the 3x3x3
    extremum test needs an interior scale) — the upsampled first octave
    (SiftScaleSpace firstOctave=-1) must recover them."""
    rng = np.random.default_rng(6)
    n = 6
    pos = np.stack([rng.uniform(24, 104, n), rng.uniform(24, 104, n)], 1)
    yy, xx = np.mgrid[0:128, 0:128]
    img = np.zeros((128, 128), np.float32)
    for cy, cx in pos:
        img += 200 * np.exp(-0.5 * (((yy - cy) / 2.0) ** 2
                                    + ((xx - cx) / 2.0) ** 2))
    img += rng.normal(0, 0.5, img.shape).astype(np.float32)
    kp = sift.detect(jnp.asarray(img), max_features=12,
                     contrast_threshold=3.0, num_octaves=3,
                     first_octave=-1)
    v = np.asarray(kp.valid)
    found = np.stack([np.asarray(kp.ys)[v], np.asarray(kp.xs)[v]], 1)
    hits = 0
    for p in pos:
        if len(found) and np.linalg.norm(found - p, axis=1).min() < 3.0:
            hits += 1
    assert hits >= 5, (hits, len(found))
    # tiny images return masked-dead keypoints instead of crashing
    kp0 = sift.detect(jnp.zeros((16, 16), jnp.float32))
    assert not np.asarray(kp0.valid).any()
