"""End-to-end CLI tests: each tool runs against generated data."""

import os

import numpy as np
import pytest


def test_batch_scan_qr_cli(tmp_path, capsys):
    from boofcv_tpu.recognition.qr import code as qr, detector
    from boofcv_tpu.io import image_io
    from boofcv_tpu.cli import batch_scan_qr
    d = tmp_path / "imgs"
    d.mkdir()
    for i, text in enumerate(["alpha", "beta"]):
        mat = qr.encode(text, 1, "M", i % 8)
        image_io.save(str(d / f"{i}.png"), detector.render(mat, 5))
    # a decoy with no QR
    image_io.save(str(d / "z.png"),
                  np.random.default_rng(0).uniform(0, 255, (60, 60)))
    rc = batch_scan_qr.main(["--images", str(d)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "alpha" in out and "beta" in out
    assert "decoded 2/3" in out


def test_camera_calibration_cli(tmp_path, capsys):
    from boofcv_tpu.io import image_io
    from boofcv_tpu.io import calibration_io as cio
    from boofcv_tpu.cli import camera_calibration
    import jax.numpy as jnp
    from boofcv_tpu.geo import se3

    # render synthetic chessboard views through a known camera
    rows, cols, sq = 4, 5, 0.03
    K = np.array([[300.0, 0, 160], [0, 300.0, 120], [0, 0, 1.0]])
    xs, ys = np.meshgrid(np.arange(cols + 2) * sq, np.arange(rows + 2) * sq)
    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    n_views = 5
    for v in range(n_views):
        w = np.array([0.3, -0.25, 0.1]) * rng.uniform(-1, 1, 3)
        R = np.asarray(se3.exp_so3(jnp.asarray(w)))
        t = np.array([rng.uniform(-0.02, 0.02), rng.uniform(-0.02, 0.02),
                      rng.uniform(0.30, 0.45)])
        # render 2x supersampled then box-downsample (camera-like blur —
        # the corner detector needs antialiased edges, as real images have)
        SS = 2
        board = np.zeros((rows + 1, cols + 1), bool)
        board[::2, ::2] = True
        board[1::2, 1::2] = True
        Kss = K.copy() * SS
        Kss[2, 2] = 1.0
        yy, xx = np.mgrid[0:240 * SS, 0:320 * SS]
        Kinv = np.linalg.inv(Kss)
        rays = np.stack([xx, yy, np.ones_like(xx)], -1) @ Kinv.T
        Rt = R.T
        d_t = rays @ R                     # direction in target frame
        c0 = -Rt @ t
        s = -c0[2] / np.where(np.abs(d_t[..., 2]) < 1e-12, 1e-12, d_t[..., 2])
        P = c0 + s[..., None] * d_t
        u = P[..., 0] + (cols + 2) * sq / 2
        vcoord = P[..., 1] + (rows + 2) * sq / 2
        bx = np.floor(u / sq).astype(int) - 1
        by = np.floor(vcoord / sq).astype(int) - 1
        inside = (bx >= 0) & (bx <= cols) & (by >= 0) & (by <= rows) & (s > 0)
        dark = np.zeros_like(inside)
        dark[inside] = board[by[inside], bx[inside]]
        img = np.where(dark, 25.0, 230.0).astype(np.float32)
        img = img.reshape(240, SS, 320, SS).mean((1, 3))
        image_io.save(str(d / f"v{v}.png"), img)

    out_yaml = str(tmp_path / "cam.yaml")
    rc = camera_calibration.main(["--images", str(d), "--rows", str(rows),
                                  "--cols", str(cols), "--square", str(sq),
                                  "--output", out_yaml])
    assert rc == 0, capsys.readouterr().err
    cam = cio.load_pinhole_brown(out_yaml)
    assert abs(cam.fx - 300.0) / 300.0 < 0.05, cam.fx
    assert abs(cam.cx - 160.0) < 10


def test_stereo_vo_demo_cli(tmp_path, capsys):
    from boofcv_tpu.io import image_io, simulate
    from boofcv_tpu.cli import stereo_vo_demo
    import jax.numpy as jnp
    from boofcv_tpu.geo import se3

    H, W = 120, 160
    K = np.array([[150.0, 0, W / 2], [0, 150.0, H / 2], [0, 0, 1.0]])
    rng = np.random.default_rng(0)
    poses = []
    for i in range(4):
        R = np.eye(3)
        c = np.array([0.0, 0.0, 0.05 * i])
        poses.append((jnp.asarray(R), jnp.asarray(-R @ c)))
    frames = simulate.render_stereo_sequence(rng, K, 0.3, poses, H, W)
    ld = tmp_path / "left"; rd = tmp_path / "right"
    ld.mkdir(); rd.mkdir()
    for i, (l, r) in enumerate(frames):
        image_io.save(str(ld / f"{i:03d}.png"), np.asarray(l))
        image_io.save(str(rd / f"{i:03d}.png"), np.asarray(r))
    out = str(tmp_path / "traj.txt")
    rc = stereo_vo_demo.main(["--left", str(ld), "--right", str(rd),
                              "--fx", "150", "--baseline", "0.3",
                              "--output", out])
    assert rc == 0
    traj = np.loadtxt(out)
    assert traj.shape == (4, 12)
    # final z displacement ~ 0.15
    assert abs(traj[-1, 11] - 0.15) < 0.05, traj[-1]


def test_create_fiducial_cli_roundtrip(tmp_path):
    import numpy as np
    from boofcv_tpu.cli import create_fiducial as cf
    from boofcv_tpu.io import image_io
    from boofcv_tpu.recognition import fiducial_square as fs
    assert cf.main(["--ids", "7", "123", "--size", "192",
                    "--output-dir", str(tmp_path)]) == 0
    for mid in (7, 123):
        img = image_io.load(str(tmp_path / f"fiducial_{mid:04d}.png"))
        dets = fs.detect(img.astype(np.float32))
        assert len(dets) == 1 and dets[0]["id"] == mid


def test_batch_remove_distortion_cli(tmp_path, capsys):
    import jax.numpy as jnp
    from boofcv_tpu.geo import cameras
    from boofcv_tpu.io import calibration_io as cio, image_io, simulate
    from boofcv_tpu.ip import distort
    from boofcv_tpu.cli import batch_remove_distortion

    H, W = 120, 160
    cam = cameras.CameraPinholeBrown(fx=140.0, fy=140.0, cx=W / 2,
                                     cy=H / 2, width=W, height=H,
                                     radial=(-0.22, 0.04))
    calib = tmp_path / "calib.yaml"
    cio.save_pinhole_brown(cam, str(calib))

    # synthesize a distorted capture of a textured plane
    rng = np.random.default_rng(0)
    ideal = simulate.noise_texture(rng, size=220, octaves=5)[:H, :W]
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float64),
                          jnp.arange(W, dtype=jnp.float64), indexing="ij")
    nx, ny = cameras.pixel_to_norm_undistorted(cam, xs, ys)
    captured = distort.warp(jnp.asarray(ideal, jnp.float32),
                            (ny * cam.fy + cam.cy).astype(jnp.float32),
                            (nx * cam.fx + cam.cx).astype(jnp.float32))
    src = tmp_path / "in"
    dst = tmp_path / "out"
    src.mkdir()
    image_io.save(str(src / "a.png"),
                  np.clip(np.asarray(captured), 0, 255).astype(np.uint8))
    rc = batch_remove_distortion.main([
        "--calib", str(calib), "--input", str(src), "--output", str(dst)])
    assert rc == 0
    assert "undistorted 1/1" in capsys.readouterr().out
    out = image_io.to_gray(image_io.load(str(dst / "a.png")))
    c = np.s_[20:-20, 20:-20]
    assert np.median(np.abs(out[c].astype(float) - ideal[c])) < 8.0


def test_fiducial_detection_cli(tmp_path, capsys):
    from boofcv_tpu.recognition import fiducial_square as fid
    from boofcv_tpu.io import image_io, calibration_io as cio
    from boofcv_tpu.geo import cameras
    from boofcv_tpu.cli import fiducial_detection

    img = fid.encode_marker(321, cells_px=12)
    scene = np.full((200, 220), 255.0, np.float32)
    h, w = img.shape
    scene[40:40 + h, 60:60 + w] = img
    d = tmp_path / "imgs"
    d.mkdir()
    image_io.save(str(d / "m.png"), scene.astype(np.uint8))
    cam = cameras.CameraPinholeBrown(fx=200.0, fy=200.0, cx=110.0,
                                     cy=100.0, width=220, height=200)
    calib = tmp_path / "calib.yaml"
    cio.save_pinhole_brown(cam, str(calib))
    rc = fiducial_detection.main(["--images", str(d), "--calib",
                                  str(calib), "--size", "0.1"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "id=321" in out and "range=" in out
    assert "found 1 fiducials" in out


def test_create_qr_document_cli_roundtrip(tmp_path, capsys):
    from boofcv_tpu.cli import create_qr_document
    from boofcv_tpu.io import image_io
    from boofcv_tpu.recognition.qr import detector

    out_png = tmp_path / "doc.png"
    rc = create_qr_document.main([
        "--message", "CLI DOC TEST", "--message", "0123456789",
        "--output", str(out_png)])
    assert rc == 0
    doc = image_io.to_gray(image_io.load(str(out_png)))
    # scan back each half
    W = doc.shape[1]
    texts = []
    for sl in (np.s_[:, :W // 2], np.s_[:, W // 2:]):
        data, info = detector.detect_and_decode(doc[sl].astype(np.float32))
        if data is not None:
            texts.append(data.decode())
    assert sorted(texts) == ["0123456789", "CLI DOC TEST"]


def test_batch_downsize_cli(tmp_path, capsys):
    import numpy as np
    from boofcv_tpu.io import image_io
    from boofcv_tpu.cli import batch_downsize

    d_in = tmp_path / "in"
    d_out = tmp_path / "out"
    d_in.mkdir()
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (96, 128)).astype(np.uint8)
    image_io.save(str(d_in / "a.png"), img)
    rc = batch_downsize.main(["--input", str(d_in), "--output", str(d_out),
                              "--max-size", "64"])
    assert rc == 0
    out = image_io.load(str(d_out / "a.png"))
    assert out.shape == (48, 64)
    # integer factor == exact 2x2 box average (AverageDownSampleOps)
    exp = img.reshape(48, 2, 64, 2).mean((1, 3))
    assert np.abs(out.astype(float) - exp).max() <= 1.0
