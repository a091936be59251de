"""Connectivity-graph chessboard assembly: unknown grid size, oblique
views, occlusion tolerance (DetectChessboardCorners2 /
ChessboardCornerClusterFinder analog oracles)."""

import numpy as np
import jax.numpy as jnp
import pytest

from boofcv_tpu.recognition import chessboard


def render_board(H_img_from_board, squares_x=6, squares_y=5,
                 height=240, width=320, dark=30.0, light=220.0,
                 supersample=3):
    """Analytic projective chessboard render: pixel -> board coords via
    H^-1; color = square parity inside [0, sx] x [0, sy], gray outside.
    Inner corners are at integer board coords (1..sx-1, 1..sy-1)."""
    Hinv = np.linalg.inv(H_img_from_board)
    s = supersample
    ys, xs = np.mgrid[0:height * s, 0:width * s].astype(np.float64)
    ys = ys / s
    xs = xs / s
    q = np.stack([xs, ys, np.ones_like(xs)], -1) @ Hinv.T
    u = q[..., 0] / q[..., 2]
    v = q[..., 1] / q[..., 2]
    inside = (u >= 0) & (u < squares_x) & (v >= 0) & (v < squares_y)
    par = (np.floor(u).astype(int) + np.floor(v).astype(int)) % 2
    img = np.where(inside, np.where(par == 0, dark, light), 128.0)
    img = img.reshape(height, s, width, s).mean((1, 3))
    # inner-corner ground truth in image coords
    uu, vv = np.meshgrid(np.arange(1, squares_x), np.arange(1, squares_y))
    g = np.stack([uu, vv, np.ones_like(uu)], -1).astype(float)
    p = g @ H_img_from_board.T
    corners = p[..., :2] / p[..., 2:]
    return img.astype(np.float32), corners     # [sy-1, sx-1, 2] (x, y)


def _match(grid, mask, gt):
    """Compare a detected (grid, mask) against GT corners, allowing the
    board's symmetries (flips/rotations of the lattice)."""
    R, C, _ = grid.shape
    gR, gC, _ = gt.shape
    variants = []
    g, m = gt, None
    for flip in (False, True):
        gg = gt[:, ::-1] if flip else gt
        for k in range(4):
            variants.append(np.rot90(gg, k, axes=(0, 1)))
    for v in variants:
        if v.shape[:2] != (R, C):
            continue
        err = np.linalg.norm(grid - v, axis=-1)
        if np.median(err[mask]) < 1.5:
            return float(err[mask].max())
    return None


def test_auto_frontal_unknown_size():
    Hm = np.array([[30.0, 0, 60], [0, 30.0, 40], [0, 0, 1.0]])
    img, gt = render_board(Hm)
    out = chessboard.detect_chessboard_auto(img)
    assert out is not None
    grid, mask = out
    assert mask.all() and mask.size == gt.shape[0] * gt.shape[1]
    err = _match(grid, mask, gt)
    assert err is not None and err < 1.0, err


def test_auto_oblique_45deg():
    # homography of a plane tilted ~50deg: project board corners through
    # a rotated camera and fit H from the 4 outer corners
    from boofcv_tpu.geo import se3, epipolar
    sx, sy = 6, 5
    K = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1.0]])
    R = np.asarray(se3.exp_so3(jnp.asarray([0.9, 0.05, 0.02])))  # ~52 deg
    t = np.array([-2.4, -1.0, 6.5])
    board = np.array([[0, 0], [sx, 0], [sx, sy], [0, sy]], float)
    Xw = np.concatenate([board, np.zeros((4, 1))], 1)
    pc = Xw @ R.T + t
    pr = (pc / pc[:, 2:]) @ K.T
    Hm = np.asarray(epipolar.homography_dlt(
        jnp.asarray(board[None]), jnp.asarray(pr[None, :, :2])))[0]
    img, gt = render_board(Hm, sx, sy)
    out = chessboard.detect_chessboard_auto(img)
    assert out is not None
    grid, mask = out
    assert mask.sum() >= 0.95 * gt.shape[0] * gt.shape[1]
    err = _match(grid, mask, gt)
    assert err is not None and err < 1.5, err


def test_auto_occluded_corners():
    Hm = np.array([[28.0, 3.0, 70], [2.0, 29.0, 50], [1e-4, 0, 1.0]])
    img, gt = render_board(Hm)
    # occlude a blob over ~10% of the inner corners
    cx, cy = gt[1, 1]
    yy, xx = np.mgrid[0:img.shape[0], 0:img.shape[1]]
    blob = (yy - cy) ** 2 + (xx - cx) ** 2 < 18 ** 2
    img = np.where(blob, 128.0, img).astype(np.float32)
    out = chessboard.detect_chessboard_auto(img)
    assert out is not None
    grid, mask = out
    n_gt = gt.shape[0] * gt.shape[1]
    assert mask.sum() >= n_gt - 3            # a few corners may be lost
    # found corners still land on the GT lattice
    err = _match(grid, mask, gt)
    assert err is not None and err < 1.5, err


def test_known_size_still_works():
    Hm = np.array([[30.0, 0, 60], [0, 30.0, 40], [0, 0, 1.0]])
    img, gt = render_board(Hm)
    rows, cols = gt.shape[0], gt.shape[1]
    grid = chessboard.detect_chessboard(img, rows, cols)
    assert grid is not None


def test_end_to_end_calibration_oblique_occluded():
    """The r02 verdict bar: end-to-end Zhang99 from rendered images with a
    >=45 deg tilted view and ~10% of corners occluded in one view —
    detection via the connectivity assembly (unknown size), calibration
    via the masked-observation path."""
    from boofcv_tpu.calib import zhang99
    from boofcv_tpu.geo import se3, epipolar

    sx, sy = 7, 5                       # squares; inner corners 6 x 4
    sq = 0.04
    W, H = 320, 240
    f = 300.0
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    board = np.array([[0, 0], [sx, 0], [sx, sy], [0, sy]], float) * 1.0
    views = [((0.3, 0.05, 0.02), (-0.13, -0.09, 0.42)),
             ((0.82, 0.1, 0.05), (-0.11, -0.11, 0.46)),   # ~48 deg tilt
             ((-0.35, 0.3, -0.04), (-0.15, -0.07, 0.40)),
             ((0.1, -0.75, 0.1), (-0.10, -0.10, 0.44)),
             ((0.45, 0.45, 0.2), (-0.14, -0.08, 0.43))]
    rng = np.random.default_rng(6)
    world = np.stack(np.meshgrid(np.arange(1, sx), np.arange(1, sy)),
                     -1).reshape(-1, 2).astype(float) * sq  # row-major (y,x)
    n = world.shape[0]
    obs = np.zeros((len(views), n, 2))
    mask = np.zeros((len(views), n), bool)

    for vi, (w, t) in enumerate(views):
        R = np.asarray(se3.exp_so3(jnp.asarray(w)))
        # board plane: X = (u*sq, v*sq, 0) -> homography K [r1*sq r2*sq t]
        Hm = K @ np.stack([R[:, 0] * sq, R[:, 1] * sq, np.asarray(t)], 1)
        img, gt = render_board(Hm, sx, sy, height=H, width=W)
        if vi == 1:
            cx_, cy_ = gt[1, 2]
            yy, xx = np.mgrid[0:H, 0:W]
            img = np.where((yy - cy_) ** 2 + (xx - cx_) ** 2 < 15 ** 2,
                           128.0, img).astype(np.float32)
        out = chessboard.detect_chessboard_auto(img)
        assert out is not None, vi
        grid, gmask = out
        if grid.shape[:2] == (sx - 1, sy - 1):       # transposed: rotate 90
            grid = np.transpose(grid[:, ::-1], (1, 0, 2))
            gmask = gmask[:, ::-1].T
        assert grid.shape[:2] == (sy - 1, sx - 1), grid.shape
        # match found corners to GT lattice cells by nearest neighbor to
        # resolve the board's 180-degree ambiguity for the test oracle
        # (a rigid in-plane flip would calibrate identically)
        flat = grid.reshape(-1, 2)
        fm = gmask.ravel()
        gtf = gt.reshape(-1, 2)
        for k in np.nonzero(fm)[0]:
            d = np.linalg.norm(gtf - flat[k], axis=1)
            j = int(np.argmin(d))
            if d[j] < 2.0:
                obs[vi, j] = flat[k]
                mask[vi, j] = True
        assert mask[vi].sum() >= (0.85 if vi == 1 else 0.95) * n, \
            (vi, mask[vi].sum())

    res = zhang99.calibrate_mono_planar(world, obs, obs_mask=mask)
    assert res.reprojection_rmse < 0.5, res.reprojection_rmse
    assert abs(res.K[0, 0] - f) / f < 0.02, res.K
    assert abs(res.K[1, 1] - f) / f < 0.02, res.K
