"""I/O codec round-trip tests (calibration YAML, PLY, BAL)."""

import numpy as np
import jax.numpy as jnp

from boofcv_tpu.io import calibration_io as cio
from boofcv_tpu.io import points_io, bal
from boofcv_tpu.geo import ba, se3


def test_pinhole_roundtrip(tmp_path):
    cam = cio.CameraPinholeBrown(640, 480, 525.1, 526.2, 0.1, 320.5, 241.2,
                                 (-0.1, 0.03), 1e-4, -2e-4)
    p = str(tmp_path / "cam.yaml")
    cio.save_pinhole_brown(cam, p)
    cam2 = cio.load_pinhole_brown(p)
    assert cam2 == cam, (cam, cam2)
    np.testing.assert_allclose(cam2.K, cam.K)


def test_stereo_roundtrip(tmp_path):
    cam = cio.CameraPinholeBrown(640, 480, 500.0, 500.0, 0.0, 320.0, 240.0)
    R = np.asarray(se3.exp_so3(jnp.asarray([0.01, 0.02, -0.01])))
    t = np.array([-0.12, 0.001, 0.002])
    sp = cio.StereoParameters(cam, cam, R, t)
    p = str(tmp_path / "stereo.yaml")
    cio.save_stereo(sp, p)
    sp2 = cio.load_stereo(p)
    np.testing.assert_allclose(sp2.R_right_to_left, R)
    np.testing.assert_allclose(sp2.t_right_to_left, t)
    assert sp2.left.fx == 500.0


def test_ply_roundtrip_binary(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(0, 1, (100, 3))
    cols = rng.integers(0, 255, (100, 3)).astype(np.uint8)
    p = str(tmp_path / "cloud.ply")
    points_io.save_ply(p, pts, cols, binary=True)
    pts2, cols2 = points_io.load_ply(p)
    np.testing.assert_allclose(pts2, pts)
    np.testing.assert_array_equal(cols2, cols)


def test_ply_roundtrip_ascii(tmp_path):
    rng = np.random.default_rng(1)
    pts = rng.normal(0, 1, (40, 3))
    p = str(tmp_path / "cloud.ply")
    points_io.save_ply(p, pts, binary=False)
    pts2, cols2 = points_io.load_ply(p)
    np.testing.assert_allclose(pts2, pts)
    assert cols2 is None


def make_bal_text(rng, n_cam=3, n_pts=12):
    lines = []
    obs = []
    for p in range(n_pts):
        for c in sorted(rng.permutation(n_cam)[:2]):
            obs.append((c, p, rng.normal(), rng.normal()))
    lines.append(f"{n_cam} {n_pts} {len(obs)}")
    for c, p, x, y in obs:
        lines.append(f"{c} {p} {x} {y}")
    for c in range(n_cam):
        for v in rng.normal(0, 0.1, 9):
            lines.append(f"{v}")
    for p in range(n_pts):
        for v in rng.normal(0, 1, 3):
            lines.append(f"{v}")
    return "\n".join(lines)


def test_bal_parse_and_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    p = str(tmp_path / "problem.txt")
    with open(p, "w") as f:
        f.write(make_bal_text(rng))
    data = bal.read_bal(p)
    assert data["cameras"].shape == (3, 9)
    prob = bal.to_problem(data)
    assert prob.model == "snavely"
    assert prob.obs_valid.sum() == data["obs"].shape[0]
    # write + reread: same observation multiset and parameters
    p2 = str(tmp_path / "out.txt")
    bal.write_bal(p2, prob)
    data2 = bal.read_bal(p2)
    np.testing.assert_allclose(np.sort(data2["obs"], axis=0),
                               np.sort(data["obs"], axis=0), atol=1e-12)
    np.testing.assert_allclose(data2["points"], data["points"], atol=1e-12)
    np.testing.assert_allclose(data2["cameras"], data["cameras"], atol=1e-9)


def test_bal_problem_optimizes(tmp_path):
    """BAL problem built from synthetic GT + noise must reduce cost."""
    rng = np.random.default_rng(3)
    # build synthetic consistent scene in snavely convention
    n_cam, n_pts = 3, 25
    pts = np.stack([rng.uniform(-1, 1, n_pts), rng.uniform(-1, 1, n_pts),
                    -rng.uniform(4, 6, n_pts)], 1)
    cams = []
    for c in range(n_cam):
        w = rng.normal(0, 0.02, 3)
        R = np.asarray(se3.exp_so3(jnp.asarray(w)))
        t = np.array([0.2 * c, 0.0, 0.0])
        cams.append((R, t, 400.0))
    obs_lines = []
    for p in range(n_pts):
        for c in range(n_cam):
            R, t, f = cams[c]
            Xc = R @ pts[p] + t
            proj = -f * Xc[:2] / Xc[2]
            obs_lines.append((c, p, proj[0], proj[1]))
    lines = [f"{n_cam} {n_pts} {len(obs_lines)}"]
    for o in obs_lines:
        lines.append(" ".join(str(v) for v in o))
    for (R, t, f) in cams:
        w = np.asarray(se3.log_so3(jnp.asarray(R)))
        for v in (*w, *t, f, 0.0, 0.0):
            lines.append(str(v))
    for p in range(n_pts):
        for v in pts[p] + rng.normal(0, 0.02, 3):  # noisy points
            lines.append(str(v))
    path = str(tmp_path / "scene.txt")
    with open(path, "w") as f:
        f.write("\n".join(lines))
    prob = bal.to_problem(bal.read_bal(path))
    out, info = ba.optimize(prob, iterations=10)
    assert float(info["final_cost"]) < 1e-6 * float(info["initial_cost"])


def test_pnm_roundtrip(tmp_path):
    from boofcv_tpu.io import image_io
    rng = np.random.default_rng(4)
    gray = rng.integers(0, 255, (30, 40)).astype(np.float32)
    p = str(tmp_path / "img.pgm")
    image_io.save(p, gray)
    np.testing.assert_array_equal(image_io.load(p), gray)
    rgb = rng.integers(0, 255, (20, 25, 3)).astype(np.float32)
    p = str(tmp_path / "img.ppm")
    image_io.save(p, rgb)
    np.testing.assert_array_equal(image_io.load(p), rgb)


def test_png_roundtrip(tmp_path):
    from boofcv_tpu.io import image_io
    rng = np.random.default_rng(5)
    gray = rng.integers(0, 255, (33, 47)).astype(np.float32)
    p = str(tmp_path / "img.png")
    image_io.save(p, gray)
    np.testing.assert_array_equal(image_io.load(p), gray)
    rgb = rng.integers(0, 255, (21, 19, 3)).astype(np.float32)
    image_io.save(p, rgb)
    np.testing.assert_array_equal(image_io.load(p), rgb)


def test_png_filtered_decode(tmp_path):
    """Decode a PNG whose rows use Sub/Up/Average/Paeth filters (write a
    custom-filtered file, ensure the unfilter path reproduces it)."""
    from boofcv_tpu.io import image_io
    import struct, zlib
    rng = np.random.default_rng(6)
    arr = rng.integers(0, 255, (8, 12)).astype(np.uint8)
    # build rows with varying filter types
    rows = []
    prev = np.zeros(12, np.int32)
    for y in range(8):
        f = y % 5
        line = arr[y].astype(np.int32)
        if f == 0:
            enc = line
        elif f == 1:
            enc = line.copy()
            for x in range(11, 0, -1):
                enc[x] = (enc[x] - line[x - 1]) & 0xFF
        elif f == 2:
            enc = (line - prev) & 0xFF
        elif f == 3:
            enc = line.copy()
            for x in range(11, -1, -1):
                left = line[x - 1] if x >= 1 else 0
                enc[x] = (enc[x] - ((left + prev[x]) >> 1)) & 0xFF
        else:
            enc = line.copy()
            for x in range(11, -1, -1):
                a = line[x - 1] if x >= 1 else 0
                b = prev[x]
                c = prev[x - 1] if x >= 1 else 0
                p_ = a + b - c
                pa, pb, pc = abs(p_ - a), abs(p_ - b), abs(p_ - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = (enc[x] - pred) & 0xFF
        rows.append(bytes([f]) + enc.astype(np.uint8).tobytes())
        prev = line
    raw = b"".join(rows)
    ihdr = struct.pack(">IIBBBBB", 12, 8, 8, 0, 0, 0, 0)
    p = str(tmp_path / "f.png")
    with open(p, "wb") as fo:
        fo.write(b"\x89PNG\r\n\x1a\n")
        fo.write(image_io._png_chunk(b"IHDR", ihdr))
        fo.write(image_io._png_chunk(b"IDAT", zlib.compress(raw)))
        fo.write(image_io._png_chunk(b"IEND", b""))
    out = image_io.load(p)
    np.testing.assert_array_equal(out, arr.astype(np.float32))


def test_mjpeg_roundtrip(tmp_path):
    from boofcv_tpu.io import video
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (32, 48), dtype=np.uint8)
              for _ in range(4)]
    p = str(tmp_path / "seq.mjpeg")
    video.write_mjpeg(p, frames, quality=95)
    out = list(video.read_mjpeg(p))
    assert len(out) == 4
    for a, b in zip(frames, out):
        assert b.shape[:2] == a.shape
        assert np.abs(a.astype(float) - b.astype(float)).mean() < 6.0


def test_image_sequence(tmp_path):
    from boofcv_tpu.io import video, image_io
    rng = np.random.default_rng(1)
    for i in range(3):
        image_io.save(str(tmp_path / f"f{i:03d}.pgm"),
                      rng.integers(0, 255, (10, 12)).astype(np.uint8))
    seq = video.ImageSequence(str(tmp_path / "*.pgm"))
    frames = list(seq)
    assert len(seq) == 3 and len(frames) == 3
    assert frames[0].shape == (10, 12)


def test_checkpoint_ba_problem(tmp_path):
    import jax.numpy as jnp
    from boofcv_tpu.geo import ba
    from boofcv_tpu.io import checkpoint
    rng = np.random.default_rng(2)
    prob = ba.make_problem(
        R=np.stack([np.eye(3)] * 2), t=rng.normal(size=(2, 3)),
        points=rng.normal(size=(5, 3)),
        obs_xy=rng.normal(size=(5, 2, 2)),
        obs_view=np.tile([0, 1], (5, 1)),
        obs_valid=np.ones((5, 2), bool))
    p = str(tmp_path / "ba.npz")
    checkpoint.save_ba_problem(p, prob)
    back = checkpoint.load_ba_problem(p)
    assert back.model == prob.model
    assert np.allclose(back.t, prob.t)
    assert np.allclose(back.obs_xy, prob.obs_xy)
    assert (np.asarray(back.fixed_views) == np.asarray(prob.fixed_views)).all()


def test_checkpoint_trajectory(tmp_path):
    from boofcv_tpu.io import checkpoint
    rng = np.random.default_rng(3)
    poses = [(np.eye(3), rng.normal(size=3)) for _ in range(4)]
    p = str(tmp_path / "traj.npz")
    checkpoint.save_trajectory(p, poses)
    back, ids = checkpoint.load_trajectory(p)
    assert len(back) == 4 and list(ids) == [0, 1, 2, 3]
    assert np.allclose(back[2][1], poses[2][1])
