"""Square-fiducial oracles: render -> detect -> decode -> pose."""

import numpy as np
import jax.numpy as jnp

from boofcv_tpu.recognition import fiducial_square as fid
from boofcv_tpu.geo import se3


def test_marker_roundtrip_axis_aligned():
    for mid in (0, 5, 1234, fid.max_marker_id()):
        img = fid.encode_marker(mid)
        dets = fid.detect(img)
        assert len(dets) == 1, (mid, len(dets))
        assert dets[0]["id"] == mid


def test_marker_rotated_image():
    mid = 777
    img = fid.encode_marker(mid)
    for k in range(1, 4):
        rot = np.rot90(img, k).copy()
        dets = fid.detect(rot)
        assert len(dets) == 1 and dets[0]["id"] == mid, k


def test_marker_pose():
    mid = 42
    img = fid.encode_marker(mid, cells_px=12)
    dets = fid.detect(img)
    assert len(dets) == 1
    c = dets[0]["corners"]
    # synthetic camera: the marker occupies known pixels; with K=I*f the
    # recovered pose should put the marker plane at a consistent distance
    f = 300.0
    K = np.array([[f, 0, img.shape[1] / 2], [0, f, img.shape[0] / 2],
                  [0, 0, 1.0]])
    R, t = fid.estimate_pose(c, marker_size=0.1, K=K)
    # reproject corners and compare
    s = 0.05
    world = np.array([[-s, -s, 0], [s, -s, 0], [s, s, 0], [-s, s, 0.0]])
    pc = world @ R.T + t
    proj = (pc / pc[:, 2:]) @ K.T
    err = np.abs(proj[:, :2] - c).max()
    assert err < 1.0, err
    assert t[2] > 0  # in front of the camera


def test_marker_in_scene_with_noise():
    rng = np.random.default_rng(0)
    mid = 321
    img = fid.encode_marker(mid, cells_px=10)
    scene = np.full((300, 400), 180.0, np.float32)
    scene[40:40 + img.shape[0], 60:60 + img.shape[1]] = img
    scene += rng.normal(0, 4, scene.shape)
    dets = fid.detect(scene)
    assert len(dets) == 1 and dets[0]["id"] == mid
    # corners near the expected square
    c = dets[0]["corners"]
    assert c[:, 0].min() > 70 and c[:, 1].min() > 50


def test_image_fiducial_detects_pattern():
    from boofcv_tpu.recognition import fiducial_square as fs
    rng = np.random.default_rng(4)
    # two distinctive patterns
    def smooth(a):
        k = np.array([0.25, 0.5, 0.25])
        for ax in (0, 1):
            a = np.apply_along_axis(
                lambda r: np.convolve(r, k, "same"), ax, a)
        return a
    # smooth patterns: image fiducials are logos, not per-pixel noise
    patterns = [smooth(smooth(rng.uniform(0, 255, (24, 24))))
                .astype(np.float32) for _ in range(2)]
    # render pattern 1 inside a black border at a known place
    img = np.full((160, 200), 220.0, np.float32)
    x0, y0, sz = 60, 40, 64
    img[y0:y0 + sz, x0:x0 + sz] = 0.0           # black border square
    b = int(sz * 0.25)
    inner = patterns[1]
    yi = ((np.arange(sz - 2 * b) + 0.5) / (sz - 2 * b) * 24).astype(int)
    img[y0 + b:y0 + sz - b, x0 + b:x0 + sz - b] = \
        inner[yi[:, None], yi[None, :]]
    dets = fs.detect_image(img, patterns)
    assert len(dets) == 1
    assert dets[0]["id"] == 1
    assert dets[0]["ncc"] > 0.7
    got = dets[0]["corners"]
    exp = {(x0 - 0.5, y0 - 0.5), (x0 + sz - 0.5, y0 - 0.5),
           (x0 - 0.5, y0 + sz - 0.5), (x0 + sz - 0.5, y0 + sz - 0.5)}
    for gx, gy in got:
        assert min((gx - ex) ** 2 + (gy - ey) ** 2
                   for ex, ey in exp) < 4.0
