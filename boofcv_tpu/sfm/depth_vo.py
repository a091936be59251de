"""RGB-D visual odometry (depth-sensor variant of the track->PnP loop).

Reference analog: boofcv-sfm abst/sfm/d3/DepthVisualOdometry.java with
alg/sfm/DepthSparse3D.java (3D from a registered depth image) driving the
same VisOdomPixelDepthPnP state machine as the stereo version.

Reuses the stereo VO step with sparse stereo BM swapped for direct depth
lookups — identical track pool, RANSAC-P3P and spawn machinery.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from boofcv_tpu.core.pyramid import PyramidConfig
from boofcv_tpu.feature import klt
from boofcv_tpu.geo import robust, se3
from boofcv_tpu.ip import pyramid_ops
from boofcv_tpu.sfm import stereo_vo as svo


def make_step(cfg: svo.StereoVoConfig, K):
    """Jitted per-frame step: (state, gray, depth) -> (state, metrics).

    depth: [H, W] metric depth (0 = invalid), registered to the gray
    image (DepthSparse3D.process analog: X = z * K^-1 [x, y, 1]).
    """
    fx = float(K[0, 0])
    fy = float(K[1, 1])
    cx = float(K[0, 2])
    cy = float(K[1, 2])
    norm_thresh = (cfg.inlier_threshold_px / fx) ** 2
    pyr_cfg = PyramidConfig(scales=cfg.pyramid_scales)
    Kj = jnp.asarray(K, jnp.float64)

    def spawn(state, pyramid, grads, gray, depth):
        n = cfg.num_tracks
        det = svo._detect_candidates(gray, cfg, n)
        cand_y = det.ys.astype(jnp.float32)
        cand_x = det.xs.astype(jnp.float32)
        cand_ok = det.valid
        d2 = ((cand_x[:, None] - state.xs[None, :]) ** 2
              + (cand_y[:, None] - state.ys[None, :]) ** 2)
        d2 = jnp.where(state.alive[None, :], d2, jnp.inf)
        cand_ok &= jnp.min(d2, axis=1) > (2 * cfg.detect_radius) ** 2
        z = depth[det.ys, det.xs]
        cand_ok &= z > 1e-6
        xn = (cand_x - cx) / fx
        yn = (cand_y - cy) / fy
        Xc = jnp.stack([xn * z, yn * z, z], -1).astype(jnp.float64)
        Rinv, tinv = se3.invert(state.R, state.t)
        Xw = Xc @ Rinv.T + tinv

        dead = ~state.alive
        slot_rank = jnp.cumsum(dead) * dead
        cand_rank = jnp.cumsum(cand_ok) * cand_ok
        by_rank = jnp.zeros((n + 1,), jnp.int32).at[cand_rank].set(
            jnp.arange(n, dtype=jnp.int32))
        n_cand = jnp.max(cand_rank)
        take = dead & (slot_rank <= n_cand) & (slot_rank > 0)
        src = by_rank[jnp.clip(slot_rank, 0, n)]
        new_xs = jnp.where(take, cand_x[src], state.xs)
        new_ys = jnp.where(take, cand_y[src], state.ys)
        new_world = jnp.where(take[:, None], Xw[src], state.world)
        new_alive = state.alive | take
        tmpl_new = klt.sample_templates(pyramid, grads, new_ys, new_xs,
                                        cfg.pyramid_scales,
                                        cfg.template_radius)
        mix = lambda new, old: tuple(
            jnp.where(take[:, None, None], n_, o_)
            for n_, o_ in zip(new, old))
        tmpl = klt.KltTemplates(
            mix(tmpl_new.desc, state.templates.desc),
            mix(tmpl_new.grad_x, state.templates.grad_x),
            mix(tmpl_new.grad_y, state.templates.grad_y))
        return state._replace(xs=new_xs, ys=new_ys, world=new_world,
                              alive=new_alive, templates=tmpl)

    @jax.jit
    def step(state: svo.StereoVoState, gray, depth):
        gray = gray.astype(jnp.float32)
        pyramid = pyramid_ops.pyramid_average(gray, pyr_cfg)
        grads = pyramid_ops.gradient(pyramid)
        nys, nxs, fault = klt.track_pyramid(
            pyramid, state.templates, state.ys, state.xs,
            cfg.pyramid_scales, cfg.klt)
        tracked = state.alive & (fault == klt.TRACK_OK)
        xs = jnp.where(tracked, nxs, state.xs)
        ys = jnp.where(tracked, nys, state.ys)

        obs = jnp.stack([(xs - cx) / fx, (ys - cy) / fy], axis=-1)
        key, sub = jax.random.split(state.key)
        res, (Rn, tn) = robust.ransac_pnp(
            sub, state.world, obs.astype(jnp.float64),
            num_hypotheses=cfg.ransac_hypotheses,
            inlier_threshold=norm_thresh, valid_mask=tracked,
            refine_iterations=cfg.refine_iterations)
        ok = res.num_inliers >= 6
        Rn = jnp.where(ok, Rn, state.R)
        tn = jnp.where(ok, tn, state.t)
        # prune only on an ACCEPTED pose (a failed RANSAC's mask is
        # junk; see stereo_vo)
        alive = tracked & (res.inliers | ~ok)
        new_state = state._replace(xs=xs, ys=ys, alive=alive, R=Rn, t=tn,
                                   key=key)
        frac = jnp.mean(alive.astype(jnp.float32))
        new_state = jax.lax.cond(
            frac < cfg.respawn_below,
            lambda s: spawn(s, pyramid, grads, gray, depth),
            lambda s: s,
            new_state)
        return new_state, {"tracked": jnp.sum(tracked),
                           "inliers": res.num_inliers,
                           "alive": jnp.sum(new_state.alive),
                           "pose_ok": ok}

    @jax.jit
    def boot(state, gray, depth):
        gray = gray.astype(jnp.float32)
        pyramid = pyramid_ops.pyramid_average(gray, pyr_cfg)
        grads = pyramid_ops.gradient(pyramid)
        return spawn(state, pyramid, grads, gray, depth)

    return step, boot


class DepthVisualOdometry:
    """Host driver (abst DepthVisualOdometry analog)."""

    def __init__(self, cfg: svo.StereoVoConfig, K, height: int, width: int,
                 seed: int = 0):
        self.cfg = cfg
        self._step, self._boot = make_step(cfg, np.asarray(K))
        self.state = svo.init_state(cfg, height, width, seed)
        self._first = True
        self.metrics = {}

    def process(self, gray, depth) -> bool:
        g = jnp.asarray(gray)
        d = jnp.asarray(depth)
        if self._first:
            self.state = self._boot(self.state, g, d)
            self._first = False
            return True
        self.state, m = self._step(self.state, g, d)
        self.metrics = {k: int(v) for k, v in m.items()}
        return bool(m["pose_ok"])

    def camera_to_world(self):
        R, t = se3.invert(self.state.R, self.state.t)
        return np.asarray(R), np.asarray(t)
