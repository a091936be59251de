"""Ablation profile of the bench.py workload on the real chip.

Runs the identical 640x480 rendered sequence through the sequence runner
under several configs to attribute the per-frame ms budget.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from boofcv_tpu.sfm import stereo_vo
from boofcv_tpu.io import simulate
from boofcv_tpu.geo import se3

H, W = 480, 640
K = np.array([[480.0, 0.0, W / 2], [0.0, 480.0, H / 2], [0.0, 0.0, 1.0]])
baseline = 0.4

rng = np.random.default_rng(0)
n_frames = 41
poses = []
cpu = jax.devices("cpu")[0]
for i in range(n_frames):
    a = 0.002 * i
    R = np.array([[np.cos(a), 0.0, np.sin(a)], [0.0, 1.0, 0.0],
                  [-np.sin(a), 0.0, np.cos(a)]])
    c = np.array([0.01 * i, 0.0, 0.05 * i])
    with jax.default_device(cpu):
        poses.append((jnp.asarray(R), jnp.asarray(-R @ c)))
with jax.default_device(cpu):
    frames = simulate.render_stereo_sequence(
        rng, K, baseline, poses, H, W, plane_origin=(0.0, 0.0, 8.0),
        texture_scale=55.0)
    frames = [(np.asarray(l), np.asarray(r)) for l, r in frames]
reps = n_frames - 1
lefts = jnp.stack([jnp.asarray(l) for l, _ in frames[1:]])
rights = jnp.stack([jnp.asarray(r) for _, r in frames[1:]])


def run_cfg(name, cfg, report_spawn=False):
    step0 = stereo_vo.make_bootstrap(cfg, K, baseline)
    state = stereo_vo.init_state(cfg, H, W)
    state = step0(state, jnp.asarray(frames[0][0]), jnp.asarray(frames[0][1]))
    run = stereo_vo.make_sequence_runner(cfg, K, baseline)
    s, (p, ms) = run(state, lefts, rights)
    jax.block_until_ready(ms)
    t0 = time.perf_counter()
    s, (p, ms) = run(state, lefts, rights)
    jax.block_until_ready(ms)
    dt = time.perf_counter() - t0
    extra = ""
    if report_spawn:
        alive = np.asarray(ms["alive"])
        tracked = np.asarray(ms["tracked"])
        inl = np.asarray(ms["inliers"])
        n_spawn = int(np.sum(alive > tracked))
        extra = (f"  spawn_frames={n_spawn}/{reps}"
                 f" alive[{alive.min()}..{alive.max()}]"
                 f" inliers[{inl.min()}..{inl.max()}]")
    print(f"{name:34s}: {dt/reps*1e3:7.3f} ms/frame ({reps/dt:6.1f} fps){extra}",
          flush=True)


base = dict(num_tracks=512, pyramid_scales=(1, 2, 4, 8), template_radius=3,
            max_disparity=96, ransac_hypotheses=256, refine_iterations=10)

run_cfg("baseline", stereo_vo.StereoVoConfig(**base), report_spawn=True)
run_cfg("no_spawn", stereo_vo.StereoVoConfig(**base, respawn_below=0.0))
run_cfg("no_refine", stereo_vo.StereoVoConfig(**{**base, "refine_iterations": 0}))
run_cfg("hyp128", stereo_vo.StereoVoConfig(**{**base, "ransac_hypotheses": 128}))
from boofcv_tpu.feature import klt as klt_mod
run_cfg("klt_iter4", stereo_vo.StereoVoConfig(
    **base, klt=klt_mod.KltConfig(max_iterations=4)))

# (the fused-Pallas KLT kernel was measured at 11.2 ms/call vs 2.7 ms
# windowed after the r4 alignment fix, and removed — PROFILE.md)
