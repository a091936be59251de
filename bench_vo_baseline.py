"""Measured CPU baseline for the stereo-VO benchmark.

A vectorized-numpy implementation of the SAME per-frame spec as
``boofcv_tpu.sfm.stereo_vo`` (the reference workload of
ExampleVisualOdometryStereo.java:66-81): 4-level average pyramid,
batched inverse-compositional pyramidal KLT (KltTracker.java:55 /
PyramidKltTracker.java:37), Shi-Tomasi spawn + sparse SAD stereo depth
(VisOdomPixelDepthPnP.java:224), and P3P-Grunert RANSAC + 6-DoF GN
refine (P3PGrunert.java; FactoryVisualOdometry.java:186-222).

This replaces the nominal "30 fps real-time" constant that earlier
rounds divided by: every ``stereo_vo_*`` bench row now reports
``vs_baseline`` = measured device fps / measured CPU fps on the SAME
synthetic sequence.  Vectorized numpy (BLAS matmuls, batched eigvals,
fancy-indexed bilinear sampling) is generous to the CPU side compared
with the reference's scalar Java loops.
"""

import time

import numpy as np


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _pyr_avg(img, scales):
    """Average pyramid matching ip.pyramid_ops.pyramid_average: level k
    is a (s_k/s_{k-1})^2 box mean of the previous level."""
    levels = [img.astype(np.float32)]
    for prev_s, s in zip(scales[:-1], scales[1:]):
        f = s // prev_s
        p = levels[-1]
        h, w = p.shape[0] // f * f, p.shape[1] // f * f
        levels.append(p[:h, :w].reshape(h // f, f, w // f, f).mean((1, 3)))
    return levels


def _gradients(img):
    gx = np.zeros_like(img)
    gy = np.zeros_like(img)
    gx[:, 1:-1] = 0.5 * (img[:, 2:] - img[:, :-2])
    gy[1:-1, :] = 0.5 * (img[2:, :] - img[:-2, :])
    return gx, gy


def _bilinear(img, ys, xs):
    """Vectorized bilinear sample (clipped to valid support)."""
    h, w = img.shape
    ys = np.clip(ys, 0.0, h - 1.001)
    xs = np.clip(xs, 0.0, w - 1.001)
    y0 = ys.astype(np.int32)
    x0 = xs.astype(np.int32)
    ay = ys - y0
    ax = xs - x0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return ((1 - ay) * ((1 - ax) * v00 + ax * v01)
            + ay * ((1 - ax) * v10 + ax * v11))


def _box_sum(img, r):
    p = np.pad(img, ((r + 1, r), (r + 1, r)))
    c = p.cumsum(0).cumsum(1)
    s = 2 * r + 1
    return c[s:, s:] - c[:-s, s:] - c[s:, :-s] + c[:-s, :-s]


def _hat(w):
    z = np.zeros_like(w[..., 0])
    return np.stack([
        np.stack([z, -w[..., 2], w[..., 1]], -1),
        np.stack([w[..., 2], z, -w[..., 0]], -1),
        np.stack([-w[..., 1], w[..., 0], z], -1)], -2)


def _exp_so3(w):
    th = np.linalg.norm(w, axis=-1, keepdims=True)
    th = np.maximum(th, 1e-12)
    Kx = _hat(w / th)
    s, c = np.sin(th)[..., None], np.cos(th)[..., None]
    return np.eye(3) + s * Kx + (1 - c) * (Kx @ Kx)


# ---------------------------------------------------------------------------
# Shi-Tomasi detection + sparse stereo (the spawn path)
# ---------------------------------------------------------------------------

def _shi_tomasi(img, radius=2):
    gx, gy = _gradients(img)
    xx = _box_sum(gx * gx, radius)
    yy = _box_sum(gy * gy, radius)
    xy = _box_sum(gx * gy, radius)
    tr = xx + yy
    det = xx * yy - xy * xy
    disc = np.sqrt(np.maximum(tr * tr * 0.25 - det, 0.0))
    return tr * 0.5 - disc


def _detect(img, n, radius, border):
    from scipy import ndimage as ndi
    inten = _shi_tomasi(img)
    mx = ndi.maximum_filter(inten, size=2 * radius + 1)
    cand = (inten >= mx) & (inten > 1.0)
    cand[:border] = cand[-border:] = False
    cand[:, :border] = cand[:, -border:] = False
    flat = np.where(cand.ravel(), inten.ravel(), -np.inf)
    k = min(n, flat.size)
    top = np.argpartition(flat, -k)[-k:]
    good = np.isfinite(flat[top])
    ys, xs = np.divmod(top[good], img.shape[1])
    return ys.astype(np.float32), xs.astype(np.float32)


def _sparse_disparity(left, right, ys, xs, dmax, r=3):
    """SAD sparse block match at integer candidates, WTA + parabola."""
    n = len(ys)
    if n == 0:
        return np.zeros(0), np.zeros(0, bool)
    yi = ys.astype(np.int32)
    xi = xs.astype(np.int32)
    h, w = left.shape
    valid = (yi >= r) & (yi < h - r) & (xi - (dmax - 1) - r >= 0) \
        & (xi + r < w)
    yi = np.clip(yi, r, h - r - 1)
    xi = np.clip(xi, dmax - 1 + r, w - r - 1)
    dy = np.arange(-r, r + 1)
    lp = left[yi[:, None, None] + dy[None, :, None],
              xi[:, None, None] + dy[None, None, :]]           # [N,P,P]
    # right strip covering x-(dmax-1)-r .. x+r
    sw = dmax + 2 * r
    dxs = np.arange(sw) - (dmax - 1) - r
    strip = right[yi[:, None, None] + dy[None, :, None],
                  xi[:, None, None] + dxs[None, None, :]]      # [N,P,SW]
    win = np.lib.stride_tricks.sliding_window_view(strip, 2 * r + 1, axis=2)
    # win: [N, P, dmax, P]; window j corresponds to disparity dmax-1-j
    sad = np.abs(win - lp[:, :, None, :]).sum((1, 3))[:, ::-1]  # [N,dmax]
    best = sad.argmin(1)
    c0 = sad[np.arange(n), best]
    cm = sad[np.arange(n), np.clip(best - 1, 0, dmax - 1)]
    cp = sad[np.arange(n), np.clip(best + 1, 0, dmax - 1)]
    denom = np.maximum(cm + cp - 2 * c0, 1e-9)
    sub = best + np.clip(0.5 * (cm - cp) / denom, -0.5, 0.5)
    return sub, valid & (sub > 0.5)


# ---------------------------------------------------------------------------
# P3P Grunert (batched numpy) + RANSAC + GN refine
# ---------------------------------------------------------------------------

def _quartic_roots_np(A4, A3, A2, A1, A0):
    """Batched real quartic roots via companion-matrix eigvals."""
    K = len(A4)
    A4s = np.where(np.abs(A4) < 1e-12, 1e-12, A4)
    C = np.zeros((K, 4, 4))
    C[:, 1, 0] = C[:, 2, 1] = C[:, 3, 2] = 1.0
    C[:, 0, 3] = -A0 / A4s
    C[:, 1, 3] = -A1 / A4s
    C[:, 2, 3] = -A2 / A4s
    C[:, 3, 3] = -A3 / A4s
    ev = np.linalg.eigvals(C)                                   # [K,4] cplx
    real = np.abs(ev.imag) < 1e-6
    return ev.real, real


def _rigid_three_points(world, cam):
    """Exact 3-point rigid alignment via triangle frames (batched)."""
    def frame(p):
        u = p[..., 1, :] - p[..., 0, :]
        v = p[..., 2, :] - p[..., 0, :]
        e1 = u / np.maximum(np.linalg.norm(u, axis=-1, keepdims=True), 1e-30)
        w = v - np.sum(v * e1, -1, keepdims=True) * e1
        e2 = w / np.maximum(np.linalg.norm(w, axis=-1, keepdims=True), 1e-30)
        e3 = np.cross(e1, e2)
        return np.stack([e1, e2, e3], -1)
    R = frame(cam) @ np.swapaxes(frame(world), -1, -2)
    cw = world.mean(-2)
    cc = cam.mean(-2)
    t = cc - np.einsum("...ij,...j->...i", R, cw)
    return R, t


def _p3p_grunert_np(world, obs):
    """world [K,3,3], obs [K,3,2] normalized -> R [K,4,3,3], t, ok."""
    f = np.concatenate([obs, np.ones_like(obs[..., :1])], -1)
    f /= np.linalg.norm(f, axis=-1, keepdims=True)
    f1, f2, f3 = f[:, 0], f[:, 1], f[:, 2]
    P1, P2, P3 = world[:, 0], world[:, 1], world[:, 2]
    a2 = ((P2 - P3) ** 2).sum(-1)
    b2 = ((P1 - P3) ** 2).sum(-1)
    c2 = ((P1 - P2) ** 2).sum(-1)
    b2 = np.maximum(b2, 1e-12)
    ca = (f2 * f3).sum(-1)
    cb = (f1 * f3).sum(-1)
    cg = (f1 * f2).sum(-1)
    q1 = (a2 - c2) / b2
    q2 = (a2 + c2) / b2
    q3 = (b2 - c2) / b2
    q4 = (b2 - a2) / b2
    A4 = (q1 - 1.0) ** 2 - 4.0 * c2 / b2 * ca ** 2
    A3 = 4.0 * (q1 * (1.0 - q1) * cb - (1.0 - q2) * ca * cg
                + 2.0 * c2 / b2 * ca ** 2 * cb)
    A2 = 2.0 * (q1 ** 2 - 1.0 + 2.0 * q1 ** 2 * cb ** 2 + 2.0 * q3 * ca ** 2
                - 4.0 * q2 * ca * cb * cg + 2.0 * q4 * cg ** 2)
    A1 = 4.0 * (-q1 * (1.0 + q1) * cb + 2.0 * a2 / b2 * cg ** 2 * cb
                - (1.0 - q2) * ca * cg)
    A0 = (1.0 + q1) ** 2 - 4.0 * a2 / b2 * cg ** 2
    v, real = _quartic_roots_np(A4, A3, A2, A1, A0)             # [K,4]
    num = (-1.0 + q1[:, None]) * v * v - 2.0 * q1[:, None] * cb[:, None] * v \
        + 1.0 + q1[:, None]
    den = 2.0 * (cg[:, None] - v * ca[:, None])
    den = np.where(np.abs(den) < 1e-30, 1e-30, den)
    u = num / den
    s1d = 1.0 + u * u - 2.0 * u * cg[:, None]
    s1 = np.sqrt(np.maximum(c2[:, None] / np.where(np.abs(s1d) < 1e-30,
                                                   1e-30, s1d), 0.0))
    s2 = u * s1
    s3 = v * s1
    ok = real & (s1 > 0) & (s2 > 0) & (s3 > 0)
    cam = np.stack([s1[..., None] * f1[:, None],
                    s2[..., None] * f2[:, None],
                    s3[..., None] * f3[:, None]], -2)           # [K,4,3,3]
    worldr = np.broadcast_to(world[:, None], cam.shape)
    R, t = _rigid_three_points(worldr, cam)
    return R, t, ok


def _gn_refine_pose(R, t, world, obs, mask, iterations=10):
    for _ in range(iterations):
        Xc = world @ R.T + t
        z = np.where(np.abs(Xc[:, 2]) < 1e-9, 1e-9, Xc[:, 2])
        iz = 1.0 / z
        r = Xc[:, :2] * iz[:, None] - obs
        zero = np.zeros_like(iz)
        A = np.stack([np.stack([iz, zero, -Xc[:, 0] * iz * iz], -1),
                      np.stack([zero, iz, -Xc[:, 1] * iz * iz], -1)], -2)
        J = np.concatenate([-(A @ _hat(Xc)), A], -1)            # [N,2,6]
        w = mask.astype(np.float64)[:, None, None]
        Jw = J * w
        H = np.einsum("nki,nkj->ij", Jw, J) + 1e-9 * np.eye(6)
        g = np.einsum("nki,nk->i", Jw, r)
        try:
            d = np.linalg.solve(H, -g)
        except np.linalg.LinAlgError:
            break
        dR = _exp_so3(d[:3])
        R = dR @ R
        t = dR @ t + d[3:]
    return R, t


def _ransac_p3p(rng, world, obs, alive, hyp, thresh2, refine_iterations):
    idx = np.flatnonzero(alive)
    if len(idx) < 6:
        return None
    samples = idx[rng.integers(0, len(idx), (hyp, 3))]
    distinct = (samples[:, 0] != samples[:, 1]) \
        & (samples[:, 0] != samples[:, 2]) & (samples[:, 1] != samples[:, 2])
    R4, t4, ok = _p3p_grunert_np(world[samples], obs[samples])
    ok &= distinct[:, None]
    Rf = R4.reshape(-1, 3, 3)
    tf = t4.reshape(-1, 3)
    # scoring in f32 via batched BLAS matmul (mirrors the device path,
    # which also classifies inliers in f32)
    w32 = world.astype(np.float32)
    o32 = obs.astype(np.float32)
    Xc = np.matmul(w32[None], np.swapaxes(Rf, 1, 2).astype(np.float32)) \
        + tf.astype(np.float32)[:, None]                        # [K4,N,3]
    z = np.where(np.abs(Xc[..., 2]) < 1e-9, 1e-9, Xc[..., 2])
    err = ((Xc[..., :2] / z[..., None] - o32[None]) ** 2).sum(-1)
    inl = (err < thresh2) & alive[None] & (z > 0)
    inl &= ok.reshape(-1)[:, None]
    counts = inl.sum(1)
    best = counts.argmax()
    if counts[best] < 6:
        return None
    R, t = _gn_refine_pose(Rf[best], tf[best], world, obs, inl[best],
                           refine_iterations)
    # final inlier classification with the refined pose
    Xc = world @ R.T + t
    z = np.where(np.abs(Xc[:, 2]) < 1e-9, 1e-9, Xc[:, 2])
    err = ((Xc[:, :2] / z[:, None] - obs) ** 2).sum(-1)
    inliers = (err < thresh2) & alive & (z > 0)
    return R, t, inliers


# ---------------------------------------------------------------------------
# the VO engine
# ---------------------------------------------------------------------------

class NumpyStereoVo:
    """Vectorized-numpy stereo VO with the benchmark workload shape."""

    def __init__(self, K, baseline, H, W, num_tracks=512,
                 scales=(1, 2, 4, 8), template_radius=3, max_disparity=96,
                 hypotheses=256, refine_iterations=10, klt_iterations=8,
                 inlier_px=1.5, respawn_below=0.6, seed=0):
        self.K = np.asarray(K, np.float64)
        self.fx, self.fy = self.K[0, 0], self.K[1, 1]
        self.cx, self.cy = self.K[0, 2], self.K[1, 2]
        self.baseline = float(baseline)
        self.H, self.W = H, W
        self.n = num_tracks
        self.scales = scales
        self.tr = template_radius
        self.dmax = max_disparity
        self.hyp = hypotheses
        self.refine_it = refine_iterations
        self.klt_it = klt_iterations
        self.thresh2 = (inlier_px / self.fx) ** 2
        self.respawn_below = respawn_below
        self.rng = np.random.default_rng(seed)
        n, p = self.n, 2 * self.tr + 1
        self.xs = np.zeros(n, np.float32)
        self.ys = np.zeros(n, np.float32)
        self.world = np.zeros((n, 3))
        self.alive = np.zeros(n, bool)
        self.desc = [np.zeros((n, p, p), np.float32) for _ in scales]
        self.tgx = [np.zeros((n, p, p), np.float32) for _ in scales]
        self.tgy = [np.zeros((n, p, p), np.float32) for _ in scales]
        self.hess = [np.zeros((n, 3), np.float32) for _ in scales]
        self.R = np.eye(3)
        self.t = np.zeros(3)

    # -- templates ---------------------------------------------------------
    def _sample_templates(self, pyr, grads, which):
        d = np.arange(-self.tr, self.tr + 1, dtype=np.float32)
        for li, s in enumerate(self.scales):
            ly = self.ys[which] / s
            lx = self.xs[which] / s
            yy = ly[:, None, None] + d[None, :, None]
            xx = lx[:, None, None] + d[None, None, :]
            img, (gx, gy) = pyr[li], grads[li]
            self.desc[li][which] = _bilinear(img, yy, xx)
            tgx = _bilinear(gx, yy, xx)
            tgy = _bilinear(gy, yy, xx)
            self.tgx[li][which] = tgx
            self.tgy[li][which] = tgy
            self.hess[li][which] = np.stack(
                [(tgx * tgx).sum((1, 2)), (tgx * tgy).sum((1, 2)),
                 (tgy * tgy).sum((1, 2))], -1)

    # -- KLT ---------------------------------------------------------------
    def _track(self, pyr):
        d = np.arange(-self.tr, self.tr + 1, dtype=np.float32)
        x = self.xs.astype(np.float64).copy()
        y = self.ys.astype(np.float64).copy()
        ok = self.alive.copy()
        for li in range(len(self.scales) - 1, -1, -1):
            s = self.scales[li]
            img = pyr[li]
            lx, ly = x / s, y / s
            Hxx, Hxy, Hyy = (self.hess[li][:, 0], self.hess[li][:, 1],
                             self.hess[li][:, 2])
            det = Hxx * Hyy - Hxy * Hxy
            ok &= det > 1e-3 * (2 * self.tr + 1) ** 2
            dets = np.where(det == 0, 1.0, det)
            for _ in range(self.klt_it):
                yy = ly[:, None, None] + d[None, :, None]
                xx = lx[:, None, None] + d[None, None, :]
                patch = _bilinear(img, yy, xx)
                e = patch - self.desc[li]
                bx = (self.tgx[li] * e).sum((1, 2))
                by = (self.tgy[li] * e).sum((1, 2))
                dx = (Hyy * bx - Hxy * by) / dets
                dy = (Hxx * by - Hxy * bx) / dets
                lx = lx - dx
                ly = ly - dy
            x, y = lx * s, ly * s
        m = self.tr * self.scales[-1] + 2
        ok &= (x >= m) & (x < self.W - m) & (y >= m) & (y < self.H - m)
        # per-pixel error check at full res
        yy = y[:, None, None] + d[None, :, None]
        xx = x[:, None, None] + d[None, None, :]
        err = np.abs(_bilinear(pyr[0], yy, xx) - self.desc[0]).mean((1, 2))
        ok &= err < 25.0
        self.xs = np.where(ok, x, self.xs).astype(np.float32)
        self.ys = np.where(ok, y, self.ys).astype(np.float32)
        return ok

    # -- spawn -------------------------------------------------------------
    def _spawn(self, left, right, pyr, grads):
        border = self.tr * self.scales[-1] + 2
        cy, cx = _detect(left, self.n, 5, max(border, self.dmax + self.tr))
        if len(cy) == 0:
            return
        live_x = self.xs[self.alive]
        live_y = self.ys[self.alive]
        if len(live_x):
            d2 = (cx[:, None] - live_x[None]) ** 2 \
                + (cy[:, None] - live_y[None]) ** 2
            keep = d2.min(1) > 100.0
            cy, cx = cy[keep], cx[keep]
        disp, dok = _sparse_disparity(left, right, cy, cx, self.dmax,
                                      self.tr)
        cy, cx, disp = cy[dok], cx[dok], disp[dok]
        dead = np.flatnonzero(~self.alive)
        take = min(len(dead), len(cy))
        if take == 0:
            return
        slots = dead[:take]
        self.xs[slots] = cx[:take]
        self.ys[slots] = cy[:take]
        Z = self.fx * self.baseline / disp[:take]
        Xc = np.stack([(cx[:take] - self.cx) * Z / self.fx,
                       (cy[:take] - self.cy) * Z / self.fy, Z], -1)
        self.world[slots] = (Xc - self.t) @ self.R
        self.alive[slots] = True
        self._sample_templates(pyr, grads, slots)

    # -- per-frame step ----------------------------------------------------
    def bootstrap(self, left, right):
        pyr = _pyr_avg(left, self.scales)
        grads = [_gradients(p) for p in pyr]
        self._spawn(left.astype(np.float32), right.astype(np.float32),
                    pyr, grads)

    def step(self, left, right):
        left = left.astype(np.float32)
        pyr = _pyr_avg(left, self.scales)
        tracked = self._track(pyr)
        obs = np.stack([(self.xs - self.cx) / self.fx,
                        (self.ys - self.cy) / self.fy], -1).astype(np.float64)
        res = _ransac_p3p(self.rng, self.world, obs, tracked, self.hyp,
                          self.thresh2, self.refine_it)
        if res is not None:
            self.R, self.t, inliers = res
            self.alive = tracked & inliers
        else:
            self.alive = tracked
        if self.alive.mean() < self.respawn_below:
            grads = [_gradients(p) for p in pyr]
            self._spawn(left, right.astype(np.float32), pyr, grads)
        return self.R, self.t


def measure_np_vo_fps(frames, K, baseline, max_frames=None, log=None,
                      reps=2):
    """Run the numpy VO over ``frames`` (list of (left, right) numpy
    pairs) and return (best fps of ``reps`` passes, diagnostics) — the
    same best-of-N protocol as the other CPU baselines (wall time on
    this host swings with allocator/page behavior)."""
    H, W = frames[0][0].shape
    seq = frames[1:max_frames + 1 if max_frames else None]
    fps = 0.0
    diag = None
    for _ in range(max(reps, 1)):
        vo = NumpyStereoVo(K, baseline, H, W)
        vo.bootstrap(*frames[0])
        t0 = time.perf_counter()
        for left, right in seq:
            R, t = vo.step(left, right)
        dt = time.perf_counter() - t0
        if len(seq) / dt > fps or diag is None:
            fps = len(seq) / dt
            diag = {"alive_frac": float(vo.alive.mean()),
                    "frames": len(seq), "seconds": dt,
                    "final_t": np.asarray(t).tolist()}
    if log:
        log(f"# numpy-VO baseline: {fps:.1f} fps over {len(seq)} frames "
            f"(best of {reps}, alive {diag['alive_frac']:.2f})")
    return fps, diag
