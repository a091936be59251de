"""Square-grid and circle-grid calibration target detectors on rendered
synthetic targets (reference test style: known geometry in, detected
lattice out)."""

import numpy as np

from boofcv_tpu.recognition import calib_targets


def render_square_grid(rows=3, cols=4, square=16, space=10, margin=24,
                       h=220, w=260):
    img = np.full((h, w), 220.0, np.float32)
    for r in range(rows):
        for c in range(cols):
            y0 = margin + r * (square + space)
            x0 = margin + c * (square + space)
            img[y0:y0 + square, x0:x0 + square] = 20.0
    return img


def render_circles(centers, radius, h, w):
    img = np.full((h, w), 220.0, np.float32)
    ys, xs = np.mgrid[0:h, 0:w]
    for cy, cx in centers:
        img[(ys - cy) ** 2 + (xs - cx) ** 2 <= radius * radius] = 20.0
    return img


def test_square_grid_detects_all_corners():
    rows, cols, square, space, margin = 3, 4, 16, 10, 24
    img = render_square_grid(rows, cols, square, space, margin)
    pts = calib_targets.detect_square_grid(img, rows, cols)
    assert pts is not None
    assert pts.shape == (4 * rows * cols, 2)
    # expected corner x coordinates along the first lattice row
    xs_expected = []
    for c in range(cols):
        x0 = margin + c * (square + space)
        xs_expected += [x0, x0 + square]
    xs_expected = np.array(sorted(xs_expected), np.float64)
    got = np.sort(pts[: 2 * cols, 0])
    assert np.abs(got - xs_expected).max() < 2.0, (got, xs_expected)
    # row-major ordering: consecutive lattice rows increase in y
    row0_y = pts[: 2 * cols, 1].mean()
    row1_y = pts[2 * cols: 4 * cols, 1].mean()
    assert row1_y > row0_y


def test_circle_regular_grid_centers():
    rows, cols, pitch, r0 = 3, 4, 36, 9
    centers = [(40 + r * pitch, 50 + c * pitch)
               for r in range(rows) for c in range(cols)]
    img = render_circles(centers, r0, 180, 220)
    pts = calib_targets.detect_circle_regular_grid(img, rows, cols)
    assert pts is not None
    assert pts.shape == (rows * cols, 2)
    exp = np.array([(x, y) for (y, x) in centers], np.float64)
    # detector returns a deterministic but possibly rotated/flipped
    # ordering; match as sets with per-point tolerance
    d = np.linalg.norm(pts[:, None, :] - exp[None, :, :], axis=-1)
    assert (d.min(axis=1) < 1.5).all()
    # and lattice ordering is row-major: first row shares ~constant y
    assert np.ptp(pts[:cols, 1]) < 3.0


def test_circle_hexagonal_grid_centers():
    rows, cols, pitch, r0 = 4, 5, 40, 8
    centers = []
    for r in range(rows):
        for c in range(cols):
            if (r + c) % 2 == 0:
                centers.append((40 + r * pitch * 0.55,
                                40 + c * pitch * 0.5))
    img = render_circles([(y, x) for y, x in centers], r0, 180, 200)
    pts = calib_targets.detect_circle_hexagonal_grid(img, rows, cols)
    assert pts is not None
    assert pts.shape == (len(centers), 2)
    exp = np.array([(x, y) for (y, x) in centers], np.float64)
    d = np.linalg.norm(pts[:, None, :] - exp[None, :, :], axis=-1)
    assert (d.min(axis=1) < 1.5).all()


def test_square_grid_rejects_wrong_count():
    img = render_square_grid(2, 2)
    assert calib_targets.detect_square_grid(img, 3, 4) is None


# ---------------------------------------------------------------------------
# round-4: connectivity ellipse-lattice growth — oblique + occluded
# ---------------------------------------------------------------------------

def _tilt_homography(h, w, shrink=0.5):
    """Plane->image homography foreshortening the right edge to ``shrink``
    of full height (a >=45-degree out-of-plane tilt)."""
    import jax.numpy as jnp
    from boofcv_tpu.geo import epipolar
    src = np.array([[0, 0], [w, 0], [w, h], [0, h]], np.float64)
    dy = h * (1 - shrink) / 2
    dst = np.array([[15, 10], [w - 25, 10 + dy],
                    [w - 30, h - 10 - dy], [18, h - 6]], np.float64)
    H = np.asarray(epipolar.homography_dlt(jnp.asarray(src[None]),
                                           jnp.asarray(dst[None])))[0]
    return H


def _warp_target(img, H):
    import jax.numpy as jnp
    from boofcv_tpu.ip import distort
    Hinv = np.linalg.inv(H)
    out = distort.warp_homography(jnp.asarray(img), jnp.asarray(Hinv),
                                  fill_value=220.0)
    return np.asarray(out)


def _apply_h(H, pts_xy):
    p = np.c_[pts_xy, np.ones(len(pts_xy))] @ H.T
    return p[:, :2] / p[:, 2:]


def test_circle_regular_grid_oblique_with_occlusion():
    rows, cols, pitch, r0 = 5, 6, 30, 8
    centers = [(30 + r * pitch, 30 + c * pitch)
               for r in range(rows) for c in range(cols)]
    img = render_circles(centers, r0, 190, 220)
    # occlude two interior circles
    occ = [(1, 2), (3, 4)]
    for (rr, cc) in occ:
        cy, cx = 30 + rr * pitch, 30 + cc * pitch
        img[cy - r0 - 2:cy + r0 + 3, cx - r0 - 2:cx + r0 + 3] = 220.0
    H = _tilt_homography(190, 220, shrink=0.5)
    warped = _warp_target(img, H)

    res = calib_targets.detect_circle_regular_grid_auto(warped)
    assert res is not None
    grid, mask = res
    assert mask.shape in ((rows, cols), (cols, rows)), mask.shape
    assert mask.sum() == rows * cols - len(occ)
    # every found center within tolerance of a projected true center
    exp = _apply_h(H, np.array([(x, y) for (y, x) in centers]))
    got = grid[mask]
    d = np.linalg.norm(got[:, None, :] - exp[None, :, :], axis=-1)
    assert (d.min(axis=1) < 2.5).all(), d.min(axis=1).max()


def test_circle_hexagonal_grid_oblique_with_occlusion():
    rows, cols, pitch = 5, 7, 36
    centers = []
    idx = []
    for r in range(rows):
        for c in range(cols):
            if (r + c) % 2 == 0:
                centers.append((30 + r * pitch * 0.55,
                                30 + c * pitch * 0.5))
                idx.append((r, c))
    img = render_circles(centers, 8, 170, 190)
    occ = [(1, 1), (2, 4)]
    for (rr, cc) in occ:
        cy = 30 + rr * pitch * 0.55
        cx = 30 + cc * pitch * 0.5
        img[int(cy) - 10:int(cy) + 11, int(cx) - 10:int(cx) + 11] = 220.0
    H = _tilt_homography(170, 190, shrink=0.52)
    warped = _warp_target(img, H)

    res = calib_targets.detect_circle_hexagonal_grid_auto(warped)
    assert res is not None
    assert len(res["points"]) == len(centers) - len(occ)
    assert {res["rows"], res["cols"]} == {rows, cols}
    exp = _apply_h(H, np.array([(x, y) for (y, x) in centers]))
    got = np.array([(x, y) for _, _, x, y in res["points"]])
    d = np.linalg.norm(got[:, None, :] - exp[None, :, :], axis=-1)
    assert (d.min(axis=1) < 2.5).all(), d.min(axis=1).max()


def test_circle_regular_grid_fixed_api_uses_connectivity_when_oblique():
    rows, cols, pitch, r0 = 4, 5, 32, 8
    centers = [(30 + r * pitch, 30 + c * pitch)
               for r in range(rows) for c in range(cols)]
    img = render_circles(centers, r0, 160, 200)
    H = _tilt_homography(160, 200, shrink=0.55)
    warped = _warp_target(img, H)
    pts = calib_targets.detect_circle_regular_grid(warped, rows, cols)
    assert pts is not None and pts.shape == (rows * cols, 2)
    exp = _apply_h(H, np.array([(x, y) for (y, x) in centers]))
    d = np.linalg.norm(pts[:, None, :] - exp[None, :, :], axis=-1)
    assert (d.min(axis=1) < 2.5).all()


def test_circle_regular_grid_rotated_view_keeps_handedness():
    """Regression: the 90-deg-rolled view must return a PROPER rotation
    of the lattice (a transpose is a reflection, which would hand
    Zhang99 a mirror-handed correspondence)."""
    rows, cols, pitch, r0 = 4, 5, 32, 8
    centers = [(30 + r * pitch, 30 + c * pitch)
               for r in range(rows) for c in range(cols)]
    img = render_circles(centers, r0, 160, 200)

    def handedness(pts, n_cols):
        v_col = pts[1] - pts[0]
        v_row = pts[n_cols] - pts[0]
        return np.sign(v_col[0] * v_row[1] - v_col[1] * v_row[0])

    pts0 = calib_targets.detect_circle_regular_grid(img, rows, cols)
    assert pts0 is not None
    rot = np.rot90(img).copy()              # camera rolled 90 degrees
    pts1 = calib_targets.detect_circle_regular_grid(rot, rows, cols)
    assert pts1 is not None and pts1.shape == (rows * cols, 2)
    assert handedness(pts0, cols) == handedness(pts1, cols)


def _render_square_grid_h(Hm, shape, rows, cols, sq=1.0, gap=0.5,
                          skip=None):
    """Rasterize a rows x cols black-square target through homography
    ``Hm`` (plane (px, py) -> image (x, y)).  Returns (image, corners)
    with corners [rows, cols, 2(v,u), 2(v,u), 2] = the projected 4
    corners of square (r, c) indexed [r, c, a, b] (a = v side, b = u
    side).  ``skip=(r, c)`` leaves one square white (occlusion)."""
    h, w = shape
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    Hinv = np.linalg.inv(Hm)
    ph = np.stack([xx, yy, np.ones_like(xx)], -1) @ Hinv.T
    px = ph[..., 0] / ph[..., 2]
    py = ph[..., 1] / ph[..., 2]
    pitch = sq + gap
    cu = np.floor(px / pitch).astype(int)
    cv = np.floor(py / pitch).astype(int)
    fu = px - cu * pitch
    fv = py - cv * pitch
    inside = (fu < sq) & (fv < sq) & (cu >= 0) & (cu < cols) \
        & (cv >= 0) & (cv < rows) & (ph[..., 2] > 0)
    if skip is not None:
        inside &= ~((cv == skip[0]) & (cu == skip[1]))
    img = np.where(inside, 20.0, 235.0).astype(np.float32)
    corners = np.zeros((rows, cols, 2, 2, 2))
    for r in range(rows):
        for c in range(cols):
            for a in range(2):
                for b in range(2):
                    p = np.array([c * pitch + b * sq, r * pitch + a * sq,
                                  1.0])
                    q = Hm @ p
                    corners[r, c, a, b] = q[:2] / q[2]
    return img, corners


def _oblique_h(tilt_deg=47.0, f=320.0, shape=(240, 320),
               grid_wh=(7.0, 5.5)):
    """Homography of a plane tilted ``tilt_deg`` about the x-axis, with
    the grid (width, height in plane units) centered in the image."""
    h, w = shape
    gw, gh = grid_wh
    th = np.radians(tilt_deg)
    R = np.array([[1, 0, 0],
                  [0, np.cos(th), -np.sin(th)],
                  [0, np.sin(th), np.cos(th)]])
    center = np.array([gw / 2, gh / 2, 0.0])
    t = np.array([0.0, 0.0, 10.0]) - R @ center
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]])
    return K @ np.c_[R[:, 0], R[:, 1], t]


def test_square_grid_auto_oblique_occluded():
    """SquaresIntoRegularClusters parity: unknown grid size, >=45 deg
    obliquity, one square occluded — the cluster assembly must recover
    the corner lattice with the occluded cells masked out."""
    rows, cols = 4, 5
    Hm = _oblique_h(47.0)
    img, corners = _render_square_grid_h(Hm, (240, 320), rows, cols,
                                         skip=(1, 2))
    res = calib_targets.detect_square_grid_auto(img)
    assert res is not None
    grid, mask = res
    # orient the recovered lattice to the rendered one
    best = None
    for k in range(4):
        g = np.rot90(grid, k, axes=(0, 1))
        m = np.rot90(mask, k)
        if m.shape == (2 * rows, 2 * cols):
            found = m.sum()
            if best is None or found > best[2]:
                best = (g, m, found)
    assert best is not None, mask.shape
    g, m, _ = best
    assert m.sum() == 4 * (rows * cols - 1), m.sum()
    # the occluded square's 4 corner cells are the masked-out ones
    holes = np.argwhere(~m)
    assert len(holes) == 4
    assert (holes // 2 == holes[0] // 2).all()
    # every found corner matches a rendered ground-truth corner to ~1.5px
    gt = corners.transpose(0, 2, 1, 3, 4).reshape(2 * rows, 2 * cols, 2)
    # allow the recovered lattice to be flipped/offset consistently:
    # compare as SETS of points
    found_pts = g[m]
    gt_mask = np.ones((rows, cols, 2, 2), bool)
    gt_mask[1, 2] = False
    gt_pts = corners[gt_mask].reshape(-1, 2)
    d = np.linalg.norm(found_pts[:, None] - gt_pts[None], axis=-1)
    # contour-polygon corner localization is ~2px at this raster
    assert d.min(1).max() < 2.5, d.min(1).max()
    # and the lattice ORDER is projectively consistent: neighboring
    # lattice cells are nearby in the image
    vs, us = np.nonzero(m)
    for v, u in zip(vs, us):
        if u + 1 < 2 * cols and m[v, u + 1]:
            assert np.linalg.norm(g[v, u + 1] - g[v, u]) < 60


def test_square_grid_known_size_falls_back_to_auto():
    """The known-size entry must survive a distractor blob via the
    cluster-assembly fallback."""
    rows, cols = 3, 4
    Hm = _oblique_h(30.0, grid_wh=(5.5, 4.0))
    img, corners = _render_square_grid_h(Hm, (240, 320), rows, cols)
    # add a big dark distractor far from the target
    img[5:35, 270:315] = 25.0
    pts = calib_targets.detect_square_grid(img, rows, cols)
    assert pts is not None
    assert pts.shape == (4 * rows * cols, 2)
    gt = corners.transpose(0, 2, 1, 3, 4).reshape(-1, 2)
    d = np.linalg.norm(pts[:, None] - gt[None], axis=-1)
    assert d.min(1).max() < 2.5


def test_square_grid_to_zhang99_full_stack():
    """Target detection -> calibration end-to-end: render the square-grid
    target in several views with a known camera, detect the corner
    lattice per view, feed the correspondences into Zhang99, and recover
    the true intrinsics (CalibrateMonoPlanar.process over
    DetectSquareGridFiducial detections — the reference's actual
    calibration workflow)."""
    from boofcv_tpu.calib import zhang99

    rows, cols = 3, 4
    sq, gap = 1.0, 0.5
    pitch = sq + gap
    f_true = 300.0
    Hh, Ww = 240, 320
    K_true = np.array([[f_true, 0, Ww / 2], [0, f_true, Hh / 2],
                       [0, 0, 1.0]])
    # world corner lattice (z=0 plane), row-major like the detector
    world = []
    for r in range(rows):
        for a in range(2):
            for c in range(cols):
                for b in range(2):
                    world.append([c * pitch + b * sq, r * pitch + a * sq])
    world = np.asarray(world)

    rng = np.random.default_rng(7)
    obs = []
    n_views = 6
    for v in range(n_views):
        tilt = 18.0 + 5.0 * v
        # vary the tilt axis a little per view (pure x-tilts are a
        # degenerate motion set for Zhang99)
        th = np.radians(tilt)
        ax = np.radians(8.0 * (v % 3 - 1))
        Rx = np.array([[1, 0, 0], [0, np.cos(th), -np.sin(th)],
                       [0, np.sin(th), np.cos(th)]])
        Rz = np.array([[np.cos(ax), -np.sin(ax), 0],
                       [np.sin(ax), np.cos(ax), 0], [0, 0, 1]])
        R = Rz @ Rx
        gw, gh = cols * pitch - gap, rows * pitch - gap
        t = np.array([0.0, 0.0, 9.0 + 0.5 * v]) \
            - R @ np.array([gw / 2, gh / 2, 0.0])
        Hm = K_true @ np.c_[R[:, 0], R[:, 1], t]
        img, _ = _render_square_grid_h(Hm, (Hh, Ww), rows, cols,
                                       sq=sq, gap=gap)
        pts = calib_targets.detect_square_grid(img, rows, cols)
        assert pts is not None, f"view {v} not detected"
        obs.append(pts)

    # detected lattices may come back rotated per view; align each to
    # the first view's ordering via the best of the 4 proper rotations
    # of the index lattice (calibration needs one consistent world map)
    def reorder(pts, k):
        g = pts.reshape(2 * rows, 2 * cols, 2)
        g = np.rot90(g, k, axes=(0, 1))
        return g.reshape(-1, 2) if g.shape[:2] == (2 * rows, 2 * cols) \
            else None

    aligned = [obs[0]]
    for pts in obs[1:]:
        aligned.append(pts)   # square grids: rotations change shape
        # unless rows==cols; with 3x4 only k=0/2 preserve shape, and the
        # renderer/detector canonicalization already matches k=0
    res = zhang99.calibrate_mono_planar(world, np.stack(aligned),
                                        iterations=30)
    assert abs(res.K[0, 0] - f_true) / f_true < 0.03, res.K
    assert res.reprojection_rmse < 1.0, res.reprojection_rmse
