"""Stage-level profile of the stereo VO step on the real chip.

Each stage is timed as its own scanned-jit program (REP iterations inside
one dispatch) so tunnel latency is amortized and we see pure device time.
"""
import time, sys
import numpy as np
import jax, jax.numpy as jnp

from boofcv_tpu.core.pyramid import PyramidConfig
from boofcv_tpu.feature import extract, intensity, klt
from boofcv_tpu.feature import disparity as disp_mod
from boofcv_tpu.geo import robust, se3, pnp
from boofcv_tpu.ip import pyramid_ops
from boofcv_tpu.sfm import stereo_vo

H, W = 480, 640
K = np.array([[480.0, 0.0, W / 2], [0.0, 480.0, H / 2], [0.0, 0.0, 1.0]])
baseline = 0.4
cfg = stereo_vo.StereoVoConfig()
REP = 50

rng = np.random.default_rng(0)
left = jnp.asarray(rng.random((H, W)), jnp.float32)
right = jnp.asarray(rng.random((H, W)), jnp.float32)
pyr_cfg = PyramidConfig(scales=cfg.pyramid_scales)
pyramid = pyramid_ops.pyramid_average(left, pyr_cfg)
grads = pyramid_ops.gradient(pyramid)
n = cfg.num_tracks
ys = jnp.asarray(rng.uniform(40, H - 40, n), jnp.float32)
xs = jnp.asarray(rng.uniform(40, W - 40, n), jnp.float32)
tmpl = klt.sample_templates(pyramid, grads, ys, xs, cfg.pyramid_scales,
                            cfg.template_radius)
world = jnp.asarray(rng.normal(0, 1, (n, 3)) + np.array([0, 0, 8.0]), jnp.float64)
obs = jnp.asarray(rng.normal(0, 0.3, (n, 2)), jnp.float64)
alive = jnp.ones(n, bool)
key = jax.random.PRNGKey(0)


def bench(name, fn, *args):
    @jax.jit
    def many(*a):
        def body(c, _):
            out = fn(*c)
            if not isinstance(out, tuple):
                out = (out,)
            return out, 0.0
        c, _ = jax.lax.scan(body, a, None, length=REP)
        return c
    out = jax.block_until_ready(many(*args))
    t0 = time.perf_counter()
    nrep = 5
    for _ in range(nrep):
        out = jax.block_until_ready(many(*args))
    ms = (time.perf_counter() - t0) / nrep / REP * 1e3
    print(f"{name:28s}: {ms:7.3f} ms")
    return ms


# 1. pyramid
def f_pyr(l):
    p = pyramid_ops.pyramid_average(l, pyr_cfg)
    return l + p[0][0, 0] * 0
bench("pyramid_average", f_pyr, left)

# 2. KLT track (XLA path)
def f_klt(y, x):
    ny, nx, f = klt.track_pyramid(pyramid, tmpl, y, x, cfg.pyramid_scales,
                                  cfg.klt)
    return ny, nx
bench("klt_track_xla", f_klt, ys, xs)

# 3. RANSAC pnp (full: sample+solve+score+refine)
def f_ransac(k, w):
    k, sub = jax.random.split(k)
    res, (Rn, tn) = robust.ransac_pnp(
        sub, w, obs, num_hypotheses=cfg.ransac_hypotheses,
        inlier_threshold=(1.5 / 480) ** 2, valid_mask=alive,
        refine_iterations=cfg.refine_iterations)
    return k, w + tn[None, :] * 0
bench("ransac_pnp_full", f_ransac, key, world)

# 3b. RANSAC without refine
def f_ransac_nr(k, w):
    k, sub = jax.random.split(k)
    res, (Rn, tn) = robust.ransac_pnp(
        sub, w, obs, num_hypotheses=cfg.ransac_hypotheses,
        inlier_threshold=(1.5 / 480) ** 2, valid_mask=alive,
        refine_iterations=0)
    return k, w + tn[None, :] * 0
bench("ransac_pnp_norefine", f_ransac_nr, key, world)

# 4. spawn path: shi-tomasi + detect
def f_detect(l):
    inten = intensity.shi_tomasi(l, radius=2)
    det = extract.detect(inten, max_features=n, radius=cfg.detect_radius,
                         threshold=cfg.detect_threshold, border=26)
    return l + det.ys[0] * 0
bench("shi_tomasi+detect", f_detect, left)

# 4b. sparse BM
def f_bm(l, r):
    dcfg = disp_mod.DisparityConfig(
        min_disparity=cfg.min_disparity, max_disparity=cfg.max_disparity,
        radius_x=cfg.disparity_radius, radius_y=cfg.disparity_radius,
        texture_threshold=0.1)
    d, v = disp_mod.sparse_block_match(l, r, ys.astype(jnp.int32),
                                       xs.astype(jnp.int32), dcfg)
    return l + d[0] * 0, r
bench("sparse_block_match_sad", f_bm, left, right)

def f_bm_ssd(l, r):
    dcfg = disp_mod.DisparityConfig(
        min_disparity=cfg.min_disparity, max_disparity=cfg.max_disparity,
        radius_x=cfg.disparity_radius, radius_y=cfg.disparity_radius,
        texture_threshold=0.1, error="ssd")
    d, v = disp_mod.sparse_block_match(l, r, ys.astype(jnp.int32),
                                       xs.astype(jnp.int32), dcfg)
    return l + d[0] * 0, r
bench("sparse_block_match_ssd", f_bm_ssd, left, right)

# 4c. template sampling
def f_tmpl(y, x):
    t = klt.sample_templates(pyramid, grads, y, x, cfg.pyramid_scales,
                             cfg.template_radius)
    return y + t.desc[0][0, 0, 0] * 0, x
bench("sample_templates", f_tmpl, ys, xs)

# 4d. pyramid gradients
def f_grad(l):
    p = pyramid_ops.pyramid_average(l, pyr_cfg)
    g = pyramid_ops.gradient(p)
    return l + g[0][0][0, 0] * 0
bench("pyramid+gradient", f_grad, left)

# 5. full step
step_body = stereo_vo._make_step_fn(cfg, K, baseline)
state = stereo_vo.init_state(cfg, H, W)
state = state._replace(xs=xs, ys=ys, world=world, alive=alive,
                       templates=tmpl)
def f_step(s):
    s2, m = step_body(s, left, right)
    return (s2,)
bench("FULL_STEP", f_step, state)
