"""Square-grid and circle-grid calibration target detectors.

Reference analog: boofcv-recognition abst/fiducial/calib/
CalibrationDetectorSquareGrid.java (grid of black squares; calibration
points = the squares' corners), CalibrationDetectorCircleRegularGrid.java
(circles on a square lattice) and CalibrationDetectorCircleHexagonalGrid
.java (circles on a hexagonal lattice), backed by
alg/fiducial/calib/squares/SquareGridTools.java and
alg/fiducial/calib/circle/Key*Grid.java + EllipseClustersIntoGrid.

TPU design: thresholding + blob labeling run on device (elementwise +
iterative label propagation); contour tracing, shape fitting, and grid
ordering are host-side on the tiny extracted data — the same
device/host split the chessboard detector uses.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from boofcv_tpu.ip import binary, threshold
from boofcv_tpu.feature import shapes
from boofcv_tpu.recognition.chessboard import _order_grid


def _black_blob_contours(image, min_area: int = 20):
    """Otsu threshold (dark shapes), label, trace external contours.
    Returns list of ([K,2] contour, area) for each big-enough blob."""
    img = jnp.asarray(image, jnp.float32)
    t = threshold.compute_otsu(img, float(jnp.min(img)), float(jnp.max(img)))
    bw = threshold.threshold(img, t, down=True)
    bw = binary.remove_point_noise(bw)
    labels = binary.label_blobs(bw)
    lab = np.asarray(labels)
    out = []
    for u in np.unique(lab):
        if u == 0:
            continue
        area = int((lab == u).sum())
        if area < min_area:
            continue
        cs = binary.contour_external((lab == u).astype(np.uint8))
        if cs:
            out.append((cs[0], area))
    return out


def detect_square_grid(image, rows: int, cols: int, min_area: int = 20):
    """Square-grid target: ``rows x cols`` black squares; calibration
    points are all 4 corners of every square, ordered as a
    (2*rows) x (2*cols) point lattice (DetectSquareGridFiducial.java).

    Returns [4*rows*cols, 2] (x, y) row-major, or None.
    """
    want = rows * cols
    quads = []
    for contour, area in _black_blob_contours(image, min_area):
        poly = shapes.fit_polygon(contour, num_sides=4)
        if poly is None or len(poly) != 4:
            continue
        if not shapes.polygon_is_convex(poly):
            continue
        quads.append((np.asarray(poly, np.float64), area))
    if len(quads) < want:
        return None
    if len(quads) > want:
        # keep the most size-consistent subset (targets have equal squares)
        areas = np.array([a for _, a in quads])
        med = np.median(areas)
        order = np.argsort(np.abs(areas - med))
        quads = [quads[i] for i in order[:want]]

    corners = np.concatenate([q for q, _ in quads], axis=0)  # [4*want, 2]
    return _order_grid(corners, 2 * rows, 2 * cols)


def _circle_centers(image, rows: int, cols: int, min_area: int):
    """Ellipse-fit the dark blobs, keep the size-consistent rows*cols."""
    want = rows * cols
    found = []
    for contour, area in _black_blob_contours(image, min_area):
        e = shapes.fit_ellipse(contour)
        if e is None or e["a"] <= 0 or e["b"] <= 0:
            continue
        if e["b"] / e["a"] < 0.3:   # too eccentric to be a target circle
            continue
        found.append((np.asarray(e["center"], np.float64), area))
    if len(found) < want:
        return None
    if len(found) > want:
        areas = np.array([a for _, a in found])
        med = np.median(areas)
        order = np.argsort(np.abs(areas - med))
        found = [found[i] for i in order[:want]]
    return np.stack([c for c, _ in found])


def detect_circle_regular_grid(image, rows: int, cols: int,
                               min_area: int = 20):
    """Regular (square-lattice) circle grid: returns the ``rows*cols``
    circle centers as [rows*cols, 2] (x, y) row-major, or None.

    (The reference additionally derives 4 tangent keypoints per circle to
    cancel perspective bias of the center — centers are the lattice used
    for grid ordering there too, KeyPointsCircleRegularGrid.java.)
    """
    centers = _circle_centers(image, rows, cols, min_area)
    if centers is None:
        return None
    return _order_grid(centers, rows, cols)


def detect_circle_hexagonal_grid(image, rows: int, cols: int,
                                 min_area: int = 10):
    """Hexagonal circle grid (EllipseClustersIntoHexagonalGrid analog).

    ``rows`` x ``cols`` counts every hex row/column (odd rows hold
    ceil(cols/2) circles, even rows floor(cols/2), as the reference's
    convention: circle (i, j) exists when i+j is even).  Returns
    [num_circles, 2] centers ordered row-major by (row, col), or None.

    Grid ordering: the hexagonal lattice is not projectively a square
    lattice, so homography cell-rounding does not apply; instead the
    dominant axes are estimated from the centers' principal directions,
    rows are clustered along the minor axis, and each row is sorted along
    the major axis — robust to moderate perspective like the reference's
    cluster-into-grid step.
    """
    num = sum((cols + 1) // 2 if r % 2 == 0 else cols // 2
              for r in range(rows))
    found = []
    for contour, area in _black_blob_contours(image, min_area):
        e = shapes.fit_ellipse(contour)
        if e is None or e["a"] <= 0 or e["b"] <= 0:
            continue
        if e["b"] / e["a"] < 0.3:
            continue
        found.append((np.asarray(e["center"], np.float64), area))
    if len(found) < num:
        return None
    if len(found) > num:
        areas = np.array([a for _, a in found])
        med = np.median(areas)
        order = np.argsort(np.abs(areas - med))
        found = [found[i] for i in order[:num]]
    pts = np.stack([c for c, _ in found])

    # principal axes of the center cloud: rows separate along the axis
    # with the SMALLER spacing-variation
    c = pts.mean(0)
    centered = pts - c
    _, _, Vt = np.linalg.svd(centered, full_matrices=False)
    major, minor = Vt[0], Vt[1]
    tm = centered @ minor     # coordinate across rows
    tj = centered @ major     # coordinate along rows
    # cluster rows: sort by tm, split where the gap exceeds half the
    # median large-gap (hex row spacing is uniform)
    order = np.argsort(tm)
    tm_s = tm[order]
    gaps = np.diff(tm_s)
    if len(gaps) == 0:
        return None
    row_gap = np.median(gaps[gaps > np.max(gaps) * 0.5]) if np.any(
        gaps > np.max(gaps) * 0.5) else np.max(gaps)
    breaks = np.nonzero(gaps > 0.5 * row_gap)[0]
    row_ids = np.zeros(num, dtype=int)
    rid = 0
    prev = -1
    for b in breaks:
        row_ids[order[prev + 1:b + 1]] = rid
        rid += 1
        prev = b
    row_ids[order[prev + 1:]] = rid
    n_rows = rid + 1
    if n_rows != rows:
        return None
    out = []
    for r in range(rows):
        sel = pts[row_ids == r]
        sel = sel[np.argsort((sel - c) @ major)]
        out.append(sel)
    expected = [(cols + 1) // 2 if r % 2 == 0 else cols // 2
                for r in range(rows)]
    if [len(o) for o in out] != expected and \
       [len(o) for o in out] != expected[::-1]:
        return None
    return np.concatenate(out, axis=0)
