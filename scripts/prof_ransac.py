"""Fine-grained RANSAC-PnP stage profile on the chip."""
import time
import numpy as np
import jax, jax.numpy as jnp
from boofcv_tpu.geo import robust, pnp

rng = np.random.default_rng(0)
N, K = 512, 256
world = jnp.asarray(rng.normal(0, 1, (N, 3)) + np.array([0, 0, 8.0]), jnp.float64)
obs = jnp.asarray(rng.normal(0, 0.3, (N, 2)), jnp.float64)
world32 = world.astype(jnp.float32)
obs32 = obs.astype(jnp.float32)
alive = jnp.ones(N, bool)
key = jax.random.PRNGKey(0)
REP = 50


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
    print(f"{name:28s}: {ms:7.3f} ms", flush=True)
    return ms


# a. sampling (top_k trick)
def f_sample(k):
    k, sub = jax.random.split(k)
    idx = robust.sample_indices(sub, K, 3, N, alive)
    return k, idx.astype(jnp.uint32)
bench("sample_indices", lambda k, _: f_sample(k), key, jnp.zeros((K, 3), jnp.uint32))

idx0 = robust.sample_indices(key, K, 3, N, alive)
sw32, so32 = world32[idx0], obs32[idx0]

# b. p3p grunert f32 batch
def f_p3p(w):
    R4, t4, ok = jax.vmap(lambda a, b: pnp.p3p_grunert(a, b, dtype=jnp.float32))(w, so32)
    return w + R4[0, 0, 0, 0] * 0
bench("p3p_grunert_f32_K256", f_p3p, sw32)

# c. scoring [K*4, N]
R0 = jnp.tile(jnp.eye(3, dtype=jnp.float32)[None], (K * 4, 1, 1))
t0_ = jnp.tile(jnp.asarray([0, 0, 1], jnp.float32)[None], (K * 4, 1))
def f_score(R, t):
    err = jax.vmap(lambda r, tt: pnp.reprojection_error_sq(r, tt, world32, obs32))(R, t)
    return R + err[0, 0] * 0, t
bench("score_1024x512_f32", f_score, R0, t0_)

# d. GN refine f64 10 iters
def f_gn(c):
    Rr, tr = pnp.gauss_newton_pose(
        jnp.eye(3, dtype=jnp.float64), jnp.zeros(3, jnp.float64) + c * 0,
        world, obs, weights=alive.astype(jnp.float64), iterations=10)
    return c + tr[0] * 0
bench("gn_refine_f64_10it", f_gn, jnp.float64(0))

# d2. GN refine f32 10 iters
def f_gn32(c):
    Rr, tr = pnp.gauss_newton_pose(
        jnp.eye(3, dtype=jnp.float32), jnp.zeros(3, jnp.float32) + c * 0,
        world32, obs32, weights=alive.astype(jnp.float32), iterations=10)
    return c + tr[0] * 0
bench("gn_refine_f32_10it", f_gn32, jnp.float32(0))

# e. full ransac f32 no refine
def f_rs(k, w):
    k, sub = jax.random.split(k)
    res, _ = robust.ransac_pnp(sub, w, obs, num_hypotheses=K,
                               inlier_threshold=(1.5 / 480) ** 2,
                               valid_mask=alive, refine_iterations=0)
    return k, w + res.num_inliers * 0.0
bench("ransac_pnp_refine0", f_rs, key, world)
