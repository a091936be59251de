"""Monocular plane-based visual odometry.

Reference analog: boofcv-sfm alg/sfm/d3/VisOdomMonoPlaneInfinity.java /
VisOdomMonoOverheadMotion2D.java — a monocular camera with known
extrinsics relative to a ground plane recovers metric motion from
features on that plane.

Design: KLT tracks frame-to-frame; a robust homography is fit to the
tracked points (plane-induced); Faugeras decomposition with the KNOWN
plane normal + camera height turns H into metric (R, t) directly —
no scale ambiguity (the reference exploits the same constraint).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from boofcv_tpu.core.pyramid import PyramidConfig
from boofcv_tpu.ip import pyramid_ops
from boofcv_tpu.feature import klt, extract, intensity
from boofcv_tpu.geo import robust, selfcalib


class MonoPlaneVisualOdometry:
    """Host driver.  plane_normal: unit normal of the ground plane in the
    CAMERA frame (e.g. (0, 1, 0)-ish for a forward camera above a floor);
    plane_distance: camera height above the plane."""

    def __init__(self, K, plane_normal, plane_distance: float,
                 num_tracks: int = 300, scales=(1, 2, 4), seed: int = 0):
        self.K = np.asarray(K, np.float64)
        self.Kinv = np.linalg.inv(self.K)
        self.n = np.asarray(plane_normal, np.float64)
        self.n /= np.linalg.norm(self.n)
        self.d = float(plane_distance)
        self.scales = scales
        self.num_tracks = num_tracks
        self.key = jax.random.PRNGKey(seed)
        self.R_cw = np.eye(3)   # world->camera
        self.t_cw = np.zeros(3)
        self._prev = None
        self._tracks = None

    def _detect(self, image):
        return extract.detect_tracks(image, max_features=self.num_tracks)

    def process(self, image) -> bool:
        img = jnp.asarray(image, jnp.float32)
        pyr_cfg = PyramidConfig(scales=self.scales)
        pyr = pyramid_ops.pyramid_average(img, pyr_cfg)
        if self._prev is None:
            self._prev = pyr
            ys, xs, valid = self._detect(img)
            grads = pyramid_ops.gradient(pyr)
            cfg = klt.KltConfig(template_radius=3)
            self._tmpl = klt.sample_templates(pyr, grads, ys, xs,
                                              self.scales, 3)
            self._tracks = (ys, xs, valid)
            return True

        ys, xs, valid = self._tracks
        cfg = klt.KltConfig(template_radius=3)
        nys, nxs, fault = klt.track_pyramid(pyr, self._tmpl, ys, xs,
                                            self.scales, cfg)
        ok = valid & (fault == klt.TRACK_OK)
        p1 = jnp.stack([xs, ys], -1).astype(jnp.float64)
        p2 = jnp.stack([nxs, nys], -1).astype(jnp.float64)
        self.key, sub = jax.random.split(self.key)
        res = robust.ransac_homography(sub, p1, p2, num_hypotheses=256,
                                       inlier_threshold_px=2.0,
                                       valid_mask=ok)
        if int(res.num_inliers) < 10:
            return False
        H = np.asarray(res.model)
        sols = selfcalib.homography_decompose(H, self.K, self.K)
        # pick the solution whose plane normal matches the known one;
        # the decomposition normalizes every candidate to n[2] >= 0
        # (negating t and n together), so compare by |dot| and re-align
        # the (t, n) sign afterwards — a signed max silently selected a
        # spurious Faugeras solution whenever the true normal has
        # negative z in the camera frame
        best = max(sols, key=lambda s: abs(float(s[2] @ self.n)))
        R_rel, t_over_d, n_est = best
        if float(n_est @ self.n) < 0:
            t_over_d = -t_over_d
            n_est = -n_est
        t_rel = t_over_d * self.d
        # accumulate: world->cur = rel ∘ world->prev
        self.R_cw = R_rel @ self.R_cw
        self.t_cw = R_rel @ self.t_cw + t_rel

        # refresh tracks for the next frame
        grads = pyramid_ops.gradient(pyr)
        ys2, xs2, valid2 = self._detect(img)
        self._tmpl = klt.sample_templates(pyr, grads, ys2, xs2,
                                          self.scales, 3)
        self._tracks = (ys2, xs2, valid2)
        self._prev = pyr
        return True

    def camera_to_world(self):
        return self.R_cw.T, -self.R_cw.T @ self.t_cw
