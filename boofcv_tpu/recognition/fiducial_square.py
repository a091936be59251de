"""Square binary fiducial markers.

Reference analog: boofcv-recognition alg/fiducial/square/ —
BaseDetectFiducialSquare.java (binary quad detection -> homography
unwarp -> decode), DetectFiducialSquareBinary.java (grid-of-bits payload
with orientation disambiguation), QuadPoseEstimator.java (PnP pose from
the 4 corners).

Marker layout (as the reference's binary square): a black border of
``border_fraction`` on each side, inner ``grid x grid`` cells encoding
the ID; orientation resolved by trying all 4 rotations against the
encoding constraint (reference uses corner cells).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from boofcv_tpu.ip import threshold as th_mod
from boofcv_tpu.ip import binary as bin_mod
from boofcv_tpu.feature import shapes
from boofcv_tpu.geo import epipolar, pnp


GRID = 4          # payload cells per side (16 bits incl. orientation cells)
BORDER = 0.25     # black border fraction per side


def encode_marker(marker_id: int, cells_px: int = 16) -> np.ndarray:
    """Render a square marker image (white background 255, marker black
    border 0).  12 payload bits (corner cells fixed for orientation:
    TL=1, TR=0, BR=0, BL=0 in cell coords)."""
    g = GRID
    n_border = int(round(g * BORDER / (1 - 2 * BORDER)))  # cells of border
    n_border = max(n_border, 1)
    total = g + 2 * n_border
    cells = np.zeros((total, total), np.uint8)  # 0 = black
    inner = np.zeros((g, g), np.uint8)
    # corner orientation cells
    inner[0, 0] = 1
    payload_positions = [(r, c) for r in range(g) for c in range(g)
                         if (r, c) not in ((0, 0), (0, g - 1),
                                           (g - 1, 0), (g - 1, g - 1))]
    bits = [(marker_id >> i) & 1 for i in range(len(payload_positions))]
    for (r, c), b in zip(payload_positions, bits):
        inner[r, c] = b
    cells[n_border:n_border + g, n_border:n_border + g] = inner
    img = np.kron(cells, np.ones((cells_px, cells_px), np.uint8)) * 255
    # white margin around the marker
    m = cells_px * 2
    out = np.full((img.shape[0] + 2 * m, img.shape[1] + 2 * m), 255, np.uint8)
    out[m:-m, m:-m] = img
    return out.astype(np.float32)


def max_marker_id() -> int:
    return 2 ** (GRID * GRID - 4) - 1


def _sample_cells(gray, corners, n_border):
    """Unwarp the quad and average-sample every cell."""
    g = GRID
    total = g + 2 * n_border
    # homography: marker unit square -> image quad
    src = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    H = np.asarray(epipolar.homography_dlt(
        jnp.asarray(src[None]), jnp.asarray(corners[None].astype(np.float64))))[0]
    vals = np.zeros((total, total))
    S = 4  # samples per cell per axis
    h, w = gray.shape
    for r in range(total):
        for c in range(total):
            acc = 0.0
            for sy in range(S):
                for sx in range(S):
                    u = (c + (sx + 0.5) / S) / total
                    v = (r + (sy + 0.5) / S) / total
                    p = H @ np.array([u, v, 1.0])
                    x = p[0] / p[2]
                    y = p[1] / p[2]
                    xi = int(round(min(max(x, 0), w - 1)))
                    yi = int(round(min(max(y, 0), h - 1)))
                    acc += gray[yi, xi]
            vals[r, c] = acc / (S * S)
    return vals


def _decode_cells(vals, n_border):
    g = GRID
    total = g + 2 * n_border
    t = (vals.max() + vals.min()) / 2.0
    bits = vals > t   # True = white
    # border must be black
    border_cells = np.ones((total, total), bool)
    border_cells[n_border:-n_border, n_border:-n_border] = False
    if bits[border_cells].mean() > 0.15:
        return None
    inner = bits[n_border:-n_border, n_border:-n_border].astype(int)
    # orientation: rotate until TL=1 and other corners 0
    for rot in range(4):
        cand = np.rot90(inner, -rot)
        corners = (cand[0, 0], cand[0, -1], cand[-1, -1], cand[-1, 0])
        if corners == (1, 0, 0, 0):
            payload_positions = [(r, c) for r in range(g) for c in range(g)
                                 if (r, c) not in ((0, 0), (0, g - 1),
                                                   (g - 1, 0), (g - 1, g - 1))]
            mid = sum(int(cand[r, c]) << i
                      for i, (r, c) in enumerate(payload_positions))
            return mid, rot
    return None


def detect(image, min_area: float = 400.0):
    """Find and decode square fiducials.

    Returns list of dicts {id, corners [4,2] (ordered from the marker's
    TL, clockwise), rotation}.
    """
    gray = np.asarray(image, np.float32)
    t = float(th_mod.compute_otsu(jnp.asarray(gray)))
    bw = np.asarray(th_mod.threshold(jnp.asarray(gray), t, down=True))
    n_border = max(int(round(GRID * BORDER / (1 - 2 * BORDER))), 1)
    results = []
    for cont in bin_mod.contour_external(bw):
        if len(cont) < 30:
            continue
        corners = shapes.fit_polygon(cont, num_sides=4, tolerance=3.0)
        if len(corners) != 4 or not shapes.polygon_is_convex(corners):
            continue
        area = 0.5 * abs(sum(
            corners[i][0] * corners[(i + 1) % 4][1]
            - corners[(i + 1) % 4][0] * corners[i][1] for i in range(4)))
        if area < min_area:
            continue
        # ensure clockwise order (y down)
        c = np.asarray(corners, np.float64)
        u = c[1] - c[0]
        v = c[2] - c[1]
        if u[0] * v[1] - u[1] * v[0] < 0:
            c = c[::-1]
        vals = _sample_cells(gray, c, n_border)
        dec = _decode_cells(vals, n_border)
        if dec is None:
            continue
        mid, rot = dec
        c_ordered = np.roll(c, -rot, axis=0)
        results.append({"id": mid, "corners": c_ordered, "rotation": rot})
    return results


def estimate_pose(corners, marker_size: float, K):
    """Marker pose from its 4 corners (QuadPoseEstimator analog).

    corners: [4, 2] pixels ordered TL, TR, BR, BL; marker_size = physical
    side length.  Returns (R, t) marker->camera.
    """
    s = marker_size / 2.0
    world = np.array([[-s, -s, 0.0], [s, -s, 0.0], [s, s, 0.0], [-s, s, 0.0]])
    Kinv = np.linalg.inv(np.asarray(K, np.float64))
    px = np.concatenate([corners, np.ones((4, 1))], 1) @ Kinv.T
    obs = px[:, :2]
    # planar PnP: homography decomposition init + GN refine
    Hm = np.asarray(epipolar.homography_dlt(
        jnp.asarray(world[None, :, :2]), jnp.asarray(obs[None])))[0]
    from boofcv_tpu.calib.zhang99 import extrinsics_from_homography
    R, t = extrinsics_from_homography(Hm, np.eye(3))
    R2, t2 = pnp.refine_pnp(jnp.asarray(R), jnp.asarray(t),
                            jnp.asarray(world), jnp.asarray(obs),
                            iterations=15)
    return np.asarray(R2), np.asarray(t2)


def _sample_interior(gray, corners, size: int, border: float = BORDER):
    """Unwarp the quad's INTERIOR (inside the black border) to a size x
    size grayscale patch via the unit-square homography."""
    src = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    H = np.asarray(epipolar.homography_dlt(
        jnp.asarray(src[None]),
        jnp.asarray(corners[None].astype(np.float64))))[0]
    h, w = gray.shape
    u = border + (1 - 2 * border) * (np.arange(size) + 0.5) / size
    uu, vv = np.meshgrid(u, u)
    P = np.stack([uu, vv, np.ones_like(uu)], -1) @ H.T
    x = np.clip(P[..., 0] / P[..., 2], 0, w - 1)
    y = np.clip(P[..., 1] / P[..., 2], 0, h - 1)
    x0 = np.clip(np.floor(x).astype(int), 0, w - 2)
    y0 = np.clip(np.floor(y).astype(int), 0, h - 2)
    fx = x - x0
    fy = y - y0
    return ((1 - fy) * ((1 - fx) * gray[y0, x0] + fx * gray[y0, x0 + 1])
            + fy * ((1 - fx) * gray[y0 + 1, x0]
                    + fx * gray[y0 + 1, x0 + 1]))


def detect_image(image, patterns, min_area: float = 400.0,
                 min_ncc: float = 0.6, sample_size: int = 32):
    """Image-pattern square fiducials (SquareImage_to_FiducialDetector /
    DetectFiducialSquareImage.java analog): black-bordered squares whose
    interior is matched by NCC against a library of grayscale patterns,
    over all 4 rotations.

    patterns: list of 2D arrays (any size; resampled to sample_size).
    Returns list of dicts {id, corners [4,2], rotation, ncc}.
    """
    gray = np.asarray(image, np.float32)
    t = float(th_mod.compute_otsu(jnp.asarray(gray)))
    bw = np.asarray(th_mod.threshold(jnp.asarray(gray), t, down=True))

    # normalize the pattern library once: [P, 4, S, S] (4 rotations)
    lib = []
    for p in patterns:
        p = np.asarray(p, np.float32)
        ph, pw = p.shape
        yi = (np.arange(sample_size) + 0.5) / sample_size * ph
        xi = (np.arange(sample_size) + 0.5) / sample_size * pw
        ps = p[yi.astype(int)[:, None], xi.astype(int)[None, :]]
        rots = []
        for r in range(4):
            q = np.rot90(ps, r)
            q = (q - q.mean()) / (q.std() + 1e-9)
            rots.append(q)
        lib.append(np.stack(rots))
    lib = np.stack(lib)                                   # [P, 4, S, S]

    results = []
    for cont in bin_mod.contour_external(bw):
        if len(cont) < 30:
            continue
        corners = shapes.fit_polygon(cont, num_sides=4, tolerance=3.0)
        if corners is None or len(corners) != 4 \
                or not shapes.polygon_is_convex(corners):
            continue
        c = np.asarray(corners, np.float64)
        area = 0.5 * abs(sum(
            c[i][0] * c[(i + 1) % 4][1] - c[(i + 1) % 4][0] * c[i][1]
            for i in range(4)))
        if area < min_area:
            continue
        u = c[1] - c[0]
        v = c[2] - c[1]
        if u[0] * v[1] - u[1] * v[0] < 0:
            c = c[::-1]
        patch = _sample_interior(gray, c, sample_size)
        pn = (patch - patch.mean()) / (patch.std() + 1e-9)
        # NCC against the whole library at once (flattened matmul)
        scores = np.tensordot(lib, pn, axes=([2, 3], [0, 1])) \
            / (sample_size * sample_size)                 # [P, 4]
        pid, rot = np.unravel_index(np.argmax(scores), scores.shape)
        best = float(scores[pid, rot])
        if best < min_ncc:
            continue
        results.append({"id": int(pid),
                        "corners": np.roll(c, -int(rot), axis=0),
                        "rotation": int(rot), "ncc": best})
    return results
