"""Oracles for dense flow, template matching, background models."""

import numpy as np
import jax.numpy as jnp

from boofcv_tpu.feature import flow, template, background


def shifted_pair(rng, h=64, w=80, dy=2, dx=-3):
    big = rng.uniform(0, 255, (h + 20, w + 20)).astype(np.float32)
    k = np.array([0.25, 0.5, 0.25])
    big = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, big)
    big = np.apply_along_axis(lambda c: np.convolve(c, k, "same"), 0, big)
    i1 = big[10:10 + h, 10:10 + w]
    i2 = big[10 + dy:10 + dy + h, 10 + dx:10 + dx + w]
    return i1, i2


def test_horn_schunck_uniform_shift():
    rng = np.random.default_rng(0)
    i1, i2 = shifted_pair(rng, dy=1, dx=-1)
    u, v = flow.horn_schunck(jnp.asarray(i1), jnp.asarray(i2),
                             alpha=15.0, iterations=400)
    # i2[p] = i1[p + (dy,dx)] => content moves by (-dy,-dx): flow (u, v)
    # should be (-dx, -dy) = (1, -1).  Single-level HS overestimates the
    # magnitude of >1px diagonal shifts (linearized data term) — check
    # direction and coarse magnitude; the pyramid test checks accuracy.
    ui = np.asarray(u)[10:-10, 10:-10]
    vi = np.asarray(v)[10:-10, 10:-10]
    assert abs(np.median(ui) - 1) < 0.8, np.median(ui)
    assert abs(np.median(vi) + 1) < 0.8, np.median(vi)


def test_horn_schunck_pyramid_larger_shift():
    rng = np.random.default_rng(1)
    i1, i2 = shifted_pair(rng, dy=4, dx=3)
    u, v = flow.horn_schunck_pyramid(jnp.asarray(i1), jnp.asarray(i2),
                                     alpha=15.0, iterations=120,
                                     scales=(1, 2, 4))
    ui = np.asarray(u)[12:-12, 12:-12]
    vi = np.asarray(v)[12:-12, 12:-12]
    assert abs(np.median(ui) + 3) < 0.6, np.median(ui)
    assert abs(np.median(vi) + 4) < 0.6, np.median(vi)


def test_block_flow_integer_shift():
    rng = np.random.default_rng(2)
    i1, i2 = shifted_pair(rng, dy=2, dx=-2)
    u, v, sad = flow.block_flow(jnp.asarray(i1), jnp.asarray(i2),
                                search_radius=3, region_radius=3)
    ui = np.asarray(u)[8:-8, 8:-8]
    vi = np.asarray(v)[8:-8, 8:-8]
    assert np.median(ui) == 2 and np.median(vi) == -2


def test_template_matching_all_methods():
    rng = np.random.default_rng(3)
    img = rng.uniform(0, 255, (60, 80)).astype(np.float32)
    ty, tx = 23, 41
    tmpl = img[ty:ty + 9, tx:tx + 11]
    for fn in (template.match_ssd, template.match_sad, template.match_ncc):
        score = fn(jnp.asarray(img), jnp.asarray(tmpl))
        det = template.find_matches(score, max_matches=1, radius=3)
        assert (int(det.ys[0]), int(det.xs[0])) == (ty, tx), fn.__name__


def test_background_basic_and_gaussian():
    rng = np.random.default_rng(4)
    bg = rng.uniform(0, 255, (40, 50)).astype(np.float32)
    model = background.basic_init(jnp.asarray(bg))
    gm = background.gaussian_init(jnp.asarray(bg))
    for _ in range(10):
        frame = bg + rng.normal(0, 2, bg.shape).astype(np.float32)
        model = background.basic_update(model, jnp.asarray(frame))
        gm = background.gaussian_update(gm, jnp.asarray(frame))
    # frame with a bright moving object
    frame = bg.copy()
    frame[10:20, 15:25] += 120
    seg_b = np.asarray(background.basic_segment(model, jnp.asarray(frame)))
    seg_g = np.asarray(background.gaussian_segment(gm, jnp.asarray(frame)))
    for seg in (seg_b, seg_g):
        assert seg[10:20, 15:25].mean() > 0.95
        outside = seg.copy()
        outside[10:20, 15:25] = 0
        assert outside.mean() < 0.05


def test_background_gmm():
    rng = np.random.default_rng(5)
    bg = rng.uniform(0, 255, (30, 40)).astype(np.float32)
    m = background.gmm_init(jnp.asarray(bg))
    for _ in range(25):
        frame = bg + rng.normal(0, 2, bg.shape).astype(np.float32)
        m = background.gmm_update(m, jnp.asarray(frame))
    frame = bg.copy()
    frame[5:15, 10:20] += 100
    seg = np.asarray(background.gmm_segment(m, jnp.asarray(frame)))
    assert seg[5:15, 10:20].mean() > 0.9
    outside = seg.copy()
    outside[5:15, 10:20] = 0
    assert outside.mean() < 0.05


def test_brox_warping_shift():
    rng = np.random.default_rng(7)
    i1, i2 = shifted_pair(rng, dy=3, dx=-2)
    u, v = flow.brox_warping(jnp.asarray(i1), jnp.asarray(i2),
                             scales=(1, 2, 4), outer_iterations=4,
                             inner_iterations=40)
    ui = np.asarray(u)[12:-12, 12:-12]
    vi = np.asarray(v)[12:-12, 12:-12]
    assert abs(np.median(ui) - 2) < 0.6, np.median(ui)
    assert abs(np.median(vi) + 3) < 0.6, np.median(vi)


def test_dense_klt_shift():
    rng = np.random.default_rng(8)
    i1, i2 = shifted_pair(rng, dy=2, dx=3)
    u, v, ok = flow.dense_klt(jnp.asarray(i1), jnp.asarray(i2),
                              radius=3, scales=(1, 2, 4))
    ui = np.asarray(u)[12:-12, 12:-12]
    vi = np.asarray(v)[12:-12, 12:-12]
    assert abs(np.median(ui) + 3) < 0.4, np.median(ui)
    assert abs(np.median(vi) + 2) < 0.4, np.median(vi)


def _translation_H(dx, dy):
    return jnp.asarray([[1.0, 0.0, dx], [0.0, 1.0, dy], [0.0, 0.0, 1.0]])


def test_background_moving_basic():
    """Camera pans over a static textured scene; a moving square appears.

    Home->current transforms are pure translations; segmentation must
    flag only the moving object, and off-model pixels must be UNKNOWN
    (alg/background/moving/BackgroundMovingBasic.java behavior).
    """
    rng = np.random.default_rng(7)
    world = rng.uniform(0, 255, size=(80, 120)).astype(np.float32)
    model = background.moving_init((48, 64))
    for k in range(8):
        dx, dy = 5 + k, 3  # camera pans right across the world image
        frame = world[dy:dy + 48, dx:dx + 64]
        H = _translation_H(-(dx - 5), 0.0)  # home frame is at dx=5
        model = background.moving_basic_update(model, jnp.asarray(frame), H)
    # next frame with a moving bright square
    dx = 13
    frame = world[3:51, dx:dx + 64].copy()
    frame[20:28, 30:38] = 255.0
    H = _translation_H(-(dx - 5), 0.0)
    seg = np.asarray(background.moving_basic_segment(
        model, jnp.asarray(frame), H, threshold=30.0))
    assert seg[24, 34] == 1
    # static textured area -> background
    assert (seg[5:15, 5:25] == 0).mean() > 0.9
    # pixels never covered by the model (right edge beyond home view+pan)
    frame_far = world[3:51, 60:124].copy()
    seg_far = np.asarray(background.moving_basic_segment(
        model, jnp.asarray(frame_far), _translation_H(-55.0, 0.0)))
    assert (seg_far[:, -10:] == background.UNKNOWN).mean() > 0.9


def test_background_moving_gaussian_and_gmm():
    rng = np.random.default_rng(8)
    world = rng.uniform(0, 255, size=(80, 120)).astype(np.float32)
    gm = background.moving_gaussian_init((48, 64))
    gmm = background.moving_gmm_init((48, 64))
    for k in range(10):
        dx = 5 + (k % 4)
        frame = world[3:51, dx:dx + 64]
        H = _translation_H(-(dx - 5), 0.0)
        gm = background.moving_gaussian_update(gm, jnp.asarray(frame), H)
        gmm = background.moving_gmm_update(gmm, jnp.asarray(frame), H)
    dx = 7
    frame = world[3:51, dx:dx + 64].copy()
    frame[20:28, 30:38] = 255.0
    H = _translation_H(-(dx - 5), 0.0)
    seg_g = np.asarray(background.moving_gaussian_segment(gm, jnp.asarray(frame), H))
    seg_m = np.asarray(background.moving_gmm_segment(gmm, jnp.asarray(frame), H))
    for seg in (seg_g, seg_m):
        assert seg[24, 34] == 1
        assert (seg[5:15, 5:25] == 0).mean() > 0.8
