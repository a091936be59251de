import time, numpy as np, jax, jax.numpy as jnp
from boofcv_tpu.sfm import stereo_vo
from boofcv_tpu.feature import klt as klt_mod
from boofcv_tpu.io import simulate
from boofcv_tpu.geo import se3

H, W = 480, 640
K = np.array([[480.0, 0.0, W/2], [0.0, 480.0, H/2], [0.0, 0.0, 1.0]])
baseline = 0.4
rng = np.random.default_rng(0)
n_frames = 21
poses = []
for i in range(n_frames):
    R = np.asarray(se3.exp_so3(jnp.asarray([0.0, 0.002*i, 0.0])))
    c = np.array([0.01*i, 0.0, 0.05*i])
    poses.append((jnp.asarray(R), jnp.asarray(-R @ c)))
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    frames = simulate.render_stereo_sequence(rng, K, baseline, poses, H, W,
        plane_origin=(0.0,0.0,8.0), texture_scale=55.0)
    frames = [(np.asarray(l), np.asarray(r)) for l, r in frames]
lefts = jnp.stack([jnp.asarray(l) for l,_ in frames[1:]])
rights = jnp.stack([jnp.asarray(r) for r_,r in [(None,f[1]) for f in frames[1:]]])

def run_cfg(tag, **kw):
    base = dict(num_tracks=512, pyramid_scales=(1,2,4,8),
        template_radius=3, max_disparity=96, ransac_hypotheses=256,
        refine_iterations=10)
    base.update(kw)
    cfg = stereo_vo.StereoVoConfig(**base)
    state = stereo_vo.init_state(cfg, H, W)
    boot = stereo_vo.make_bootstrap(cfg, K, baseline)
    state = boot(state, jnp.asarray(frames[0][0]), jnp.asarray(frames[0][1]))
    run = stereo_vo.make_sequence_runner(cfg, K, baseline)
    s, (poses_, ms) = run(state, lefts, rights); jax.block_until_ready(ms)
    t0 = time.perf_counter()
    s, (poses_, ms) = run(state, lefts, rights); jax.block_until_ready(ms)
    dt = time.perf_counter() - t0
    print(f"{tag}: {20/dt:.1f} fps ({1000*dt/20:.1f} ms/frame), inliers_last={int(ms['inliers'][-1])}", flush=True)

run_cfg("baseline-cfg")







