"""Oracles for wavelet, FFT, stats, MLS modules."""

import numpy as np
import jax.numpy as jnp
import pytest

from boofcv_tpu.ip import wavelet, fft, stats, mls


@pytest.mark.parametrize("wave", ["haar", "daub4"])
def test_dwt_perfect_reconstruction(wave):
    rng = np.random.default_rng(0)
    img = rng.normal(0, 1, (64, 64)).astype(np.float32)
    ll, bands = wavelet.dwt2(jnp.asarray(img), wave)
    rec = np.asarray(wavelet.idwt2(ll, bands, wave))
    np.testing.assert_allclose(rec, img, atol=1e-4)


@pytest.mark.parametrize("wave", ["haar", "daub4"])
def test_multilevel_reconstruction(wave):
    rng = np.random.default_rng(1)
    img = rng.normal(0, 1, (64, 96)).astype(np.float32)
    ll, coeffs = wavelet.wavedec2(jnp.asarray(img), wave, levels=3)
    rec = np.asarray(wavelet.waverec2(ll, coeffs, wave))
    np.testing.assert_allclose(rec, img, atol=1e-4)


def test_wavelet_energy_compaction():
    # smooth image: detail energy should be tiny vs approx energy
    yy, xx = np.mgrid[0:64, 0:64]
    img = np.sin(yy / 20.0) + np.cos(xx / 15.0)
    ll, bands = wavelet.dwt2(jnp.asarray(img.astype(np.float32)))
    e_ll = float(jnp.sum(ll ** 2))
    e_d = sum(float(jnp.sum(b ** 2)) for b in bands)
    assert e_d < 0.01 * e_ll


@pytest.mark.parametrize("rule", [wavelet.denoise_visu, wavelet.denoise_bayes,
                                  wavelet.denoise_sure])
def test_wavelet_denoising_reduces_noise(rule):
    rng = np.random.default_rng(2)
    yy, xx = np.mgrid[0:64, 0:64]
    clean = 50 * np.sin(yy / 10.0) * np.cos(xx / 12.0)
    noisy = clean + rng.normal(0, 8, clean.shape)
    den = np.asarray(rule(jnp.asarray(noisy.astype(np.float32)), levels=2))
    err_noisy = np.mean((noisy - clean) ** 2)
    err_den = np.mean((den - clean) ** 2)
    assert err_den < 0.6 * err_noisy


def test_fft_roundtrip_and_filter():
    rng = np.random.default_rng(3)
    img = rng.normal(0, 1, (32, 48)).astype(np.float32)
    rec = np.asarray(fft.inverse(fft.forward(img)))
    np.testing.assert_allclose(rec, img, atol=1e-5)
    # low-pass reduces high-frequency energy
    tr = fft.gaussian_lowpass_transfer(32, 48, 0.2)
    out = np.asarray(fft.filter_frequency(img, tr))
    assert out.std() < img.std()


def test_local_normalize():
    rng = np.random.default_rng(4)
    img = rng.normal(5.0, 2.0, (40, 40)).astype(np.float32) * 10
    out = np.asarray(stats.local_normalize(img, radius=8))
    assert abs(out.mean()) < 0.2
    assert 0.5 < out.std() < 1.5


def test_mls_identity_and_shift():
    rng = np.random.default_rng(5)
    img = rng.uniform(0, 255, (40, 50)).astype(np.float32)
    pts = np.array([[5.0, 5.0], [45.0, 5.0], [5.0, 35.0], [45.0, 35.0]])
    # identity: src == dst
    out = np.asarray(mls.deform(img, pts, pts))
    np.testing.assert_allclose(out[5:-5, 5:-5], img[5:-5, 5:-5], atol=1e-3)
    # uniform shift of all control points => shifted image
    out2 = np.asarray(mls.deform(img, pts, pts + np.array([3.0, 0.0])))
    np.testing.assert_allclose(out2[10:-10, 10:-10],
                               img[10:-10, 7:-13], atol=1e-2)


def test_mls_similarity_identity():
    rng = np.random.default_rng(6)
    img = rng.uniform(0, 255, (30, 30)).astype(np.float32)
    pts = np.array([[4.0, 4.0], [25.0, 4.0], [4.0, 25.0], [25.0, 25.0]])
    out = np.asarray(mls.deform(img, pts, pts, kind="similarity"))
    np.testing.assert_allclose(out[4:-4, 4:-4], img[4:-4, 4:-4], atol=1e-3)


def test_steerable_first_derivative():
    from boofcv_tpu.ip import steerable
    # steered 0deg = Gx basis; 90deg = Gy basis
    gx = steerable.gaussian_basis_2d(1, 0, 1.2, 4)
    g0 = steerable.steer_first_derivative(0.0, 1.2, 4)
    g90 = steerable.steer_first_derivative(np.pi / 2, 1.2, 4)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(gx), atol=1e-6)
    gy = steerable.gaussian_basis_2d(0, 1, 1.2, 4)
    np.testing.assert_allclose(np.asarray(g90), np.asarray(gy), atol=1e-6)


def test_gray_ops():
    from boofcv_tpu.ip import gray_ops
    img = np.array([[0.0, 100.0, 250.0]])
    np.testing.assert_allclose(np.asarray(gray_ops.brighten(img, 10)),
                               [[10, 110, 255]])
    np.testing.assert_allclose(np.asarray(gray_ops.invert(img)),
                               [[255, 155, 5]])
    np.testing.assert_allclose(np.asarray(gray_ops.stretch(img, 2.0, 5.0)),
                               [[5, 205, 255]])


def test_cloud_utils():
    from boofcv_tpu.geo import cloud
    rng = np.random.default_rng(0)
    pts = rng.normal(0, 1, (200, 3))
    pts[0] = [50.0, 0, 0]  # outlier
    keep = np.asarray(cloud.filter_radius_outliers(pts, 8, 2.0))
    assert not keep[0] and keep[1:].mean() > 0.95
    idx, d = cloud.nearest_neighbors(pts[:5], pts, k=1)
    np.testing.assert_array_equal(np.asarray(idx)[:, 0], np.arange(5))
    stats = cloud.statistics(pts)
    assert abs(float(stats["mean"][1])) < 0.2
    ds = cloud.downsample_voxel(pts, 0.5)
    assert len(ds) < len(pts)


def test_orientation_estimators():
    from boofcv_tpu.feature import orientation
    import jax.numpy as jnp
    # image with a pure-x gradient: orientation should be ~0
    yy, xx = np.mgrid[0:64, 0:64]
    img = (xx * 3.0).astype(np.float32)
    ys = jnp.asarray([32.0, 20.0]); xs = jnp.asarray([32.0, 40.0])
    for fn in (orientation.average, orientation.histogram,
               orientation.sliding_window):
        ang = np.asarray(fn(img, ys, xs))
        err = np.abs((ang + np.pi) % (2 * np.pi) - np.pi)
        assert (err < 0.15).all(), (fn.__name__, ang)


def test_yuv420_roundtrip():
    from boofcv_tpu.ip import color
    # constant-chroma image: 4:2:0 subsampling is lossless, so the
    # coefficient pair must round-trip exactly (up to f32)
    ramp = np.linspace(40, 200, 32 * 40).reshape(32, 40).astype(np.float32)
    rgb = np.stack([ramp, 0.8 * ramp + 20, 0.5 * ramp + 60], -1)
    y, u, v = color.rgb_to_yuv420(jnp.asarray(rgb))
    assert y.shape == (32, 40) and u.shape == (16, 20)
    back = np.asarray(color.yuv420_to_rgb(y, u, v))
    # chroma varies slowly along the ramp -> tiny subsampling loss only
    assert np.abs(back - rgb).mean() < 0.5
    # luma channel is exact regardless of chroma content
    y2, _, _ = color.rgb_to_yuv420(jnp.asarray(back))
    assert np.abs(np.asarray(y2) - np.asarray(y)).max() < 0.2


def test_hough_foot_detects_lines():
    from boofcv_tpu.feature import lines
    img = np.zeros((96, 96), np.float32)
    img[30, :] = 200.0  # horizontal bright line at y=30
    img[:, 70] = 200.0  # vertical at x=70
    det = lines.hough_foot(jnp.asarray(img), max_lines=4,
                           edge_threshold=50.0)
    v = np.asarray(det.valid)
    fx = np.asarray(det.fx)[v]
    fy = np.asarray(det.fy)[v]
    # foot of the horizontal line: (cx, 30); vertical: (70, cy)
    assert any(abs(b - 30) <= 2 and abs(a - 47.5) <= 2
               for a, b in zip(fx, fy)), (fx, fy)
    assert any(abs(a - 70) <= 2 and abs(b - 47.5) <= 2
               for a, b in zip(fx, fy)), (fx, fy)


def test_visualize_smoke(tmp_path):
    from boofcv_tpu.io import visualize
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (40, 50))
    visualize.save_features(str(tmp_path / "f.png"), img,
                            [10, 20], [15, 30])
    visualize.save_disparity(str(tmp_path / "d.png"),
                             rng.uniform(0, 32, (40, 50)))
    visualize.save_point_cloud(str(tmp_path / "p.png"),
                               rng.normal(size=(100, 3)))
    visualize.save_trajectory(str(tmp_path / "t.png"),
                              rng.normal(size=(10, 3)))
    for n in ("f", "d", "p", "t"):
        assert (tmp_path / f"{n}.png").stat().st_size > 500


def test_create_calibration_target_cli(tmp_path):
    from boofcv_tpu.cli import create_calibration_target as cct
    from boofcv_tpu.io import image_io
    out = str(tmp_path / "t.pgm")
    assert cct.main(["--type", "square_grid", "--rows", "3", "--cols", "4",
                     "--square", "16", "--space", "10",
                     "--output", out]) == 0
    img = image_io.load(out)
    # the rendered target must be detectable by our own detector
    from boofcv_tpu.recognition import calib_targets
    pts = calib_targets.detect_square_grid(img.astype(np.float32), 3, 4)
    assert pts is not None and pts.shape == (48, 2)


def test_weight_functions():
    from boofcv_tpu.ip import weights
    u = np.asarray(weights.uniform_pixel(2))
    assert u.shape == (5, 5) and abs(u.sum() - 1.0) < 1e-6
    g = np.asarray(weights.gaussian_pixel(3, sigma=1.5))
    assert g.shape == (7, 7) and abs(g.sum() - 1.0) < 1e-5
    assert g[3, 3] == g.max() and g[0, 0] == g.min()
    d = np.asarray(weights.distance_sq_gaussian(jnp.asarray([0.0, 4.0]), 2.0))
    np.testing.assert_allclose(d, [1.0, np.exp(-0.5)], atol=1e-6)
    du = np.asarray(weights.distance_uniform(jnp.asarray([1.0, 9.1]), 3.0))
    assert du[0] > 0 and du[1] == 0


def test_associate_mutual_tiled_matches_dense():
    from boofcv_tpu.feature import associate
    rng = np.random.default_rng(9)
    a = jnp.asarray(rng.normal(0, 1, (300, 32)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 1, (451, 32)).astype(np.float32))
    dense = associate.associate_mutual(associate.score_euclidean_sq(a, b),
                                       max_error=20.0)
    tiled = associate.associate_mutual_tiled(a, b, tile=128, max_error=20.0)
    np.testing.assert_array_equal(np.asarray(dense.valid),
                                  np.asarray(tiled.valid))
    v = np.asarray(dense.valid)
    np.testing.assert_array_equal(np.asarray(dense.dst)[v],
                                  np.asarray(tiled.dst)[v])
    np.testing.assert_allclose(np.asarray(dense.score)[v],
                               np.asarray(tiled.score)[v], rtol=2e-4,
                               atol=1e-4)


def test_associate_three_by_pairs_composes():
    from boofcv_tpu.feature import associate
    rng = np.random.default_rng(10)
    base = rng.normal(0, 1, (80, 32)).astype(np.float32)
    # three views observe the same features, permuted, with noise; view 3
    # misses some features entirely
    p2 = rng.permutation(80)
    p3 = rng.permutation(80)[:60]
    d1 = jnp.asarray(base + rng.normal(0, 0.02, base.shape).astype(np.float32))
    d2 = jnp.asarray(base[p2] + rng.normal(0, 0.02, (80, 32)).astype(np.float32))
    d3 = jnp.asarray(base[p3] + rng.normal(0, 0.02, (60, 32)).astype(np.float32))
    i1, i2, i3, v = associate.associate_three_by_pairs(d1, d2, d3,
                                                      max_error=1.0)
    v = np.asarray(v)
    assert v.sum() >= 55          # nearly all co-visible features triple up
    # every valid triple refers to the same underlying feature
    inv2 = np.argsort(p2)
    for a_, b_, c_ in zip(np.asarray(i1)[v], np.asarray(i2)[v],
                          np.asarray(i3)[v]):
        assert p2[b_] == a_ and p3[c_] == a_
