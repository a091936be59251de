import time, numpy as np, jax, jax.numpy as jnp
from boofcv_tpu.geo import robust, pnp
rng = np.random.default_rng(0)
N, K = 512, 256
world = jnp.asarray(rng.normal(0,1,(N,3))+np.array([0,0,8.]), jnp.float64)
obs = jnp.asarray(rng.normal(0,0.3,(N,2)), jnp.float64)
alive = jnp.ones(N, bool)
key = jax.random.PRNGKey(0)
REP = 50
def scan_bench(name, fn, x0):
    @jax.jit
    def many(x):
        def body(c, _): return fn(c), 0.
        c, _ = jax.lax.scan(body, x, None, length=REP)
        return c
    out = jax.block_until_ready(many(x0))
    t0=time.perf_counter(); n=5
    for _ in range(n): out = jax.block_until_ready(many(x0))
    print(f"{name}: {(time.perf_counter()-t0)/n/REP*1e3:.3f} ms")

idx = robust.sample_indices(key, K, 3, N, alive)
sw, so = world[idx], obs[idx]
def solve32(c):
    R4, t4, ok = jax.vmap(lambda w,o: pnp.p3p_grunert(w,o,dtype=jnp.float32))(sw + c*0, so)
    return c + R4[0,0,0,0].astype(jnp.float64)*0
scan_bench("p3p_solve_f32", solve32, jnp.float64(0))
def ref(c):
    Rr, tr = pnp.gauss_newton_pose(jnp.eye(3,dtype=jnp.float64), jnp.zeros(3,dtype=jnp.float64)+c*0, world, obs, weights=alive.astype(jnp.float64), iterations=10)
    return c + tr[0]*0
scan_bench("gn_mixed_10it", ref, jnp.float64(0))
def ransac_only(c):
    k, w = c
    k, sub = jax.random.split(k)
    res = robust.ransac(sub, (w, obs), lambda s: pnp.p3p_grunert(s[0], s[1], dtype=jnp.float32),
        lambda m, p: jnp.where(m[2], pnp.reprojection_error_sq(m[0].astype(jnp.float32), m[1].astype(jnp.float32), p[0].astype(jnp.float32), p[1].astype(jnp.float32)), jnp.inf),
        3, K, (1.5/480)**2, valid_mask=alive, solutions_per_sample=4)
    return (k, w + res.model[1][None,:].astype(jnp.float64)*0)
scan_bench("ransac_no_refine", ransac_only, (key, world))
