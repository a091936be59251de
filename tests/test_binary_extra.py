"""Binary thinning + internal-contour tracing (round-4 gaps vs
BinaryThinning.java / LinearContourLabelChang2004.java)."""

import numpy as np
import jax.numpy as jnp

from boofcv_tpu.ip import binary


def _n_components(mask, eight=True):
    _, n = binary.label_blobs_host(mask, eight=eight)
    return n


def test_thin_bar_to_line():
    img = np.zeros((32, 64), np.uint8)
    img[12:19, 8:56] = 1          # 7-px-thick horizontal bar
    sk = np.asarray(binary.thin(jnp.asarray(img)))
    assert sk.sum() > 30
    # 1-px thin: no fully-set 2x2 block
    blocks = sk[:-1, :-1] & sk[1:, :-1] & sk[:-1, 1:] & sk[1:, 1:]
    assert blocks.sum() == 0
    # connected, single component, inside the original bar
    assert _n_components(sk) == 1
    assert (sk & ~img).sum() == 0
    # roughly the medial axis: all skeleton rows near the bar center
    ys, _ = np.nonzero(sk)
    assert np.all(np.abs(ys - 15) <= 1)


def test_thin_preserves_single_pixel_line():
    img = np.zeros((20, 40), np.uint8)
    img[10, 5:35] = 1
    sk = np.asarray(binary.thin(jnp.asarray(img)))
    assert np.array_equal(sk, img)


def test_thin_cross_stays_connected():
    img = np.zeros((50, 50), np.uint8)
    img[22:29, 5:45] = 1
    img[5:45, 22:29] = 1
    sk = np.asarray(binary.thin(jnp.asarray(img)))
    assert _n_components(sk) == 1
    blocks = sk[:-1, :-1] & sk[1:, :-1] & sk[:-1, 1:] & sk[1:, 1:]
    assert blocks.sum() == 0


def test_contours_with_holes_donut():
    img = np.zeros((40, 40), np.uint8)
    yy, xx = np.mgrid[0:40, 0:40]
    r = np.hypot(yy - 20, xx - 20)
    img[(r < 15) & (r > 6)] = 1
    res = binary.contours_with_holes(img)
    assert len(res) == 1
    assert len(res[0]["internal"]) == 1
    ext = res[0]["external"]
    inn = res[0]["internal"][0]
    # external near r=15, internal near r=6, both ON blob pixels
    re = np.hypot(ext[:, 1] - 20, ext[:, 0] - 20)
    ri = np.hypot(inn[:, 1] - 20, inn[:, 0] - 20)
    assert np.all(np.abs(re - 14) < 2.0)
    assert np.all(np.abs(ri - 6.5) < 2.0)
    assert all(img[y, x] for x, y in ext)
    assert all(img[y, x] for x, y in inn)
    # internal contour pixels are 8-adjacent to the hole
    hole = (r <= 6).astype(bool)
    grown = np.zeros_like(hole)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            grown |= np.roll(np.roll(hole, dy, 0), dx, 1)
    assert all(grown[y, x] for x, y in inn)


def test_contours_with_holes_two_holes_and_solid_blob():
    img = np.zeros((30, 60), np.uint8)
    img[2:28, 2:40] = 1
    img[8:13, 8:13] = 0       # hole A
    img[15:24, 20:33] = 0     # hole B
    img[5:25, 45:55] = 1      # second blob, solid
    res = binary.contours_with_holes(img)
    assert len(res) == 2
    n_int = sorted(len(b["internal"]) for b in res)
    assert n_int == [0, 2]
    for b in res:
        assert b["external"] is not None and len(b["external"]) >= 8
