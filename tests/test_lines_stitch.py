"""Hough line + 2D stitching oracles."""

import numpy as np
import jax.numpy as jnp

from boofcv_tpu.feature import lines
from boofcv_tpu.sfm import stitch2d


def test_hough_binary_finds_lines():
    h, w = 80, 100
    img = np.zeros((h, w), np.uint8)
    img[20, :] = 1                       # horizontal line y=20
    img[:, 60] = 1                       # vertical line x=60
    res = lines.hough_binary(img, max_lines=2)
    found = []
    for i in range(2):
        if bool(res.valid[i]):
            found.append((float(res.rho[i]), float(res.theta[i])))
    assert len(found) == 2
    # vertical line x=60: theta ~ 0, rho ~ 60-49.5=10.5
    # horizontal line y=20: theta ~ pi/2, rho ~ 20-39.5=-19.5
    vert = min(found, key=lambda f: abs(f[1]))
    horz = max(found, key=lambda f: abs(f[1]))
    assert abs(vert[0] - 10.5) < 1.5 and abs(vert[1]) < 0.05
    assert abs(horz[0] - (-19.5)) < 1.5 and abs(horz[1] - np.pi / 2) < 0.05


def test_hough_gradient_finds_edge():
    h, w = 60, 80
    img = np.zeros((h, w), np.float32)
    img[:, 40:] = 200.0                  # vertical step at x~40
    res = lines.hough_gradient(img, max_lines=1, edge_threshold=50.0)
    assert bool(res.valid[0])
    assert abs(float(res.theta[0])) < 0.1          # vertical line
    assert abs(float(res.rho[0]) - (39.5 - 39.5)) < 2.0


def test_stitcher_translating_camera():
    from boofcv_tpu.io.simulate import noise_texture
    rng = np.random.default_rng(0)
    # multi-octave texture: KLT needs coarse-scale structure
    big = noise_texture(rng, size=260)[:140, :260].copy()
    frames = [big[10:110, 10 + 12 * i:10 + 12 * i + 120] for i in range(5)]
    st = stitch2d.Stitcher(140, 260, offset=(10.0, 10.0), num_tracks=200)
    for f in frames:
        assert st.process(f)
    # recovered transform of the last frame should be ~translation of 48px
    H = st.H_mosaic_from_frame
    assert abs(H[0, 2] - (10 + 48)) < 1.0, H
    assert abs(H[1, 2] - 10) < 1.0, H
    assert abs(H[0, 0] - 1) < 0.02 and abs(H[1, 1] - 1) < 0.02
    # mosaic should match the source where covered
    m = st.image()
    err = np.abs(m[30:90, 30:150] - big[30:90, 30:150])
    assert np.median(err) < 4.0


def test_grid_ransac_lines_finds_edges():
    from boofcv_tpu.feature.lines import grid_ransac_lines
    # a bright rectangle: its 4 edges produce strong straight gradients
    img = np.zeros((96, 128), np.float32)
    img[24:72, 32:96] = 200.0
    segs = grid_ransac_lines(jnp.asarray(img), region_size=32,
                             edge_threshold=50.0, min_inliers=8)
    v = np.asarray(segs.valid)
    assert v.sum() >= 4
    x0 = np.asarray(segs.x0)[v]
    y0 = np.asarray(segs.y0)[v]
    x1 = np.asarray(segs.x1)[v]
    y1 = np.asarray(segs.y1)[v]
    # every found segment hugs one of the rectangle's edge lines
    for a, b, c, d in zip(x0, y0, x1, y1):
        horizontal = abs(d - b) < 1.5
        vertical = abs(c - a) < 1.5
        assert horizontal or vertical, (a, b, c, d)
        if horizontal:
            assert min(abs(b - 23.5), abs(b - 71.5)) < 1.5, b
        else:
            assert min(abs(a - 31.5), abs(a - 95.5)) < 1.5, a


def test_grid_ransac_lines_empty_image():
    from boofcv_tpu.feature.lines import grid_ransac_lines
    img = np.full((64, 64), 100.0, np.float32)
    segs = grid_ransac_lines(jnp.asarray(img), region_size=32)
    assert not np.asarray(segs.valid).any()


def test_connect_segments_merges_fragments():
    """A long line crossing several grid regions comes back from
    grid_ransac_lines as per-region fragments; connect_segments must
    return ONE segment per true line spanning (almost) its full length
    (ConnectLinesGrid.java:59 parity)."""
    from boofcv_tpu.feature import lines as ln

    h, w = 128, 192
    img = np.zeros((h, w), np.float32)
    yy, xx = np.mgrid[0:h, 0:w]
    # line A: horizontal y=40 from x=10..180; line B: diagonal
    img[(np.abs(yy - 40) <= 1) & (xx >= 10) & (xx <= 180)] = 200.0
    d = np.abs((yy - 90) - 0.4 * (xx - 20))
    img[(d <= 1.2) & (xx >= 20) & (xx <= 170)] = 200.0
    segs = ln.grid_ransac_lines(img, region_size=32, edge_threshold=30.0)
    n_frag = int(np.asarray(segs.valid).sum())
    assert n_frag > 4, n_frag            # fragmented across regions
    # dist_tol spans the ~2.4px-wide bar: both intensity edges of one
    # rendered line group together
    merged = ln.connect_segments(segs, dist_tol=3.0)
    assert len(merged.x0) == 2, len(merged.x0)
    lengths = np.hypot(merged.x1 - merged.x0, merged.y1 - merged.y0)
    lengths = np.sort(lengths)
    # horizontal line (~170 px) fully spanned; the diagonal's grid
    # detection is sparser, but the merged segment must span several
    # regions (region_size=32 — fragments alone cap out around one
    # region's diagonal)
    assert lengths[1] > 0.8 * 170, lengths
    assert lengths[0] > 2.5 * 32, lengths


def test_prune_merge_similar_hough():
    from boofcv_tpu.feature import lines as ln
    import jax.numpy as jnp

    # slot 3 is the same line as slot 0 across the pi wrap (theta just
    # under pi with rho's sign flipped == theta just over 0); slot 4 is
    # a dead slot
    rho = jnp.asarray([50.0, 52.0, -30.0, -49.0, 0.0])
    theta = jnp.asarray([0.03, 0.05, 1.8, np.pi - 0.01, 0.0])
    score = jnp.asarray([100.0, 60.0, 80.0, 40.0, 0.0])
    valid = jnp.asarray([True, True, True, True, False])
    out = ln.prune_merge_similar(
        ln.HoughLines(rho, theta, score, valid),
        rho_tol=6.0, theta_tol=0.12)
    v = np.asarray(out.valid)
    assert v.sum() == 2, v               # 0 absorbs 1 and 3; 2 survives
    assert v[0] and v[2]
    # merged keeper: score-weighted mean of (50, 52, 49-wrapped)
    r0 = float(np.asarray(out.rho)[0])
    assert 49.5 < r0 < 51.5, r0
    assert float(np.asarray(out.score)[0]) == 200.0
