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
