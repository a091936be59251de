"""Uncalibrated (projective) rectification oracles vs the calibrated path
(RectifyFundamental.java analog)."""

import numpy as np
import jax.numpy as jnp
import pytest

from boofcv_tpu.geo import epipolar, rectify, se3


def _scene(rng, n=150, rot=(0.0, -0.06, 0.01), t=(0.6, 0.03, 0.05)):
    W, H = 320, 240
    K = np.array([[260.0, 0, W / 2], [0, 260.0, H / 2], [0, 0, 1.0]])
    pts = np.stack([rng.uniform(-2, 2, n), rng.uniform(-1.5, 1.5, n),
                    rng.uniform(4, 9, n)], 1)
    R = np.asarray(se3.exp_so3(jnp.asarray(rot)))
    t = np.asarray(t)

    def proj(P, R_, t_):
        pc = P @ R_.T + t_
        pr = (pc / pc[:, 2:]) @ K.T
        return pr[:, :2], pc[:, 2]

    p1, z1 = proj(pts, np.eye(3), np.zeros(3))
    p2, z2 = proj(pts, R, t)
    inb = ((p1 > 8) & (p1 < [W - 8, H - 8])).all(1) \
        & ((p2 > 8) & (p2 < [W - 8, H - 8])).all(1) & (z1 > 0) & (z2 > 0)
    return K, R, t, p1[inb], p2[inb], W, H


def _apply(Hm, p):
    q = np.concatenate([p, np.ones((len(p), 1))], 1) @ np.asarray(Hm).T
    return q[:, :2] / q[:, 2:]


def test_uncalibrated_rows_align():
    rng = np.random.default_rng(0)
    K, R, t, p1, p2, W, H = _scene(rng)
    # ground-truth F
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    F = np.linalg.inv(K).T @ (tx @ R) @ np.linalg.inv(K)
    r1, r2 = rectify.rectify_uncalibrated(F, p1, p2, W, H)
    q1 = _apply(r1, p1)
    q2 = _apply(r2, p2)
    # the defining property: correspondences land on the same row
    dy = np.abs(q1[:, 1] - q2[:, 1])
    assert np.median(dy) < 0.05 and dy.max() < 0.5, (np.median(dy), dy.max())
    # and x-disparity was shear-minimized to a sane scale
    assert np.median(np.abs(q1[:, 0] - q2[:, 0])) < 50.0


def test_uncalibrated_matches_calibrated_row_alignment():
    """Both paths must produce epipolar-aligned rows on the same scene;
    the uncalibrated result should be no worse than 10x the calibrated
    path's residual row misalignment (same noisy F-free geometry)."""
    rng = np.random.default_rng(1)
    K, R, t, p1, p2, W, H = _scene(rng)
    pair = rectify.rectify_calibrated(K, K, R, t)
    c1 = _apply(pair.rect1, p1)
    c2 = _apply(pair.rect2, p2)
    dy_cal = np.abs(c1[:, 1] - c2[:, 1]).max()

    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    F = np.linalg.inv(K).T @ (tx @ R) @ np.linalg.inv(K)
    r1, r2 = rectify.rectify_uncalibrated(F, p1, p2, W, H)
    u1 = _apply(r1, p1)
    u2 = _apply(r2, p2)
    dy_unc = np.abs(u1[:, 1] - u2[:, 1]).max()
    assert dy_unc < max(10.0 * dy_cal, 0.5), (dy_unc, dy_cal)


def test_uncalibrated_from_ransac_f_and_adjust():
    """End-to-end: noisy correspondences -> RANSAC F -> rectify -> adjust
    to canvas; rows align within the noise and the canvas is filled."""
    import jax
    from boofcv_tpu.geo import robust

    rng = np.random.default_rng(2)
    K, R, t, p1, p2, W, H = _scene(rng)
    p1n = p1 + rng.normal(0, 0.3, p1.shape)
    p2n = p2 + rng.normal(0, 0.3, p2.shape)
    res = robust.ransac_fundamental(jax.random.PRNGKey(0),
                                    jnp.asarray(p1n), jnp.asarray(p2n),
                                    num_hypotheses=512,
                                    inlier_threshold_px=1.5)
    F = np.asarray(res.model[0])
    inl = np.asarray(res.inliers)
    r1, r2 = rectify.rectify_uncalibrated(F, p1n[inl], p2n[inl], W, H)
    r1, r2 = rectify.adjust_rectification(r1, r2, W, H)
    q1 = _apply(r1, p1n[inl])
    q2 = _apply(r2, p2n[inl])
    dy = np.abs(q1[:, 1] - q2[:, 1])
    assert np.median(dy) < 1.0, np.median(dy)
    # adjusted image-1 corners inside the canvas
    corners = np.array([[0, 0], [W - 1.0, 0], [W - 1, H - 1], [0, H - 1]])
    qc = _apply(r1, corners)
    assert qc.min() > -1.0 and qc[:, 0].max() < W + 1 \
        and qc[:, 1].max() < H + 1


def test_epipole_inside_image_raises():
    # forward motion: epipole at the image center
    rng = np.random.default_rng(3)
    K, R, t, p1, p2, W, H = _scene(rng, rot=(0, 0, 0), t=(0.0, 0.0, 0.4))
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    F = np.linalg.inv(K).T @ (tx @ R) @ np.linalg.inv(K)
    with pytest.raises(ValueError):
        rectify.rectify_uncalibrated(F, p1, p2, W, H)
