import time, numpy as np, jax, jax.numpy as jnp
from jax import lax
H, W, N, r = 480, 640, 512, 3
p = 2*r+1
rng = np.random.default_rng(0)
img = jax.device_put(jnp.asarray(rng.uniform(0,255,(H,W)), jnp.float32))
cy0 = jnp.asarray(rng.uniform(30, H-30, N), jnp.float32)
cx0 = jnp.asarray(rng.uniform(30, W-30, N), jnp.float32)

def sample_ds(image, cy, cx):
    y0f = jnp.floor(cy); x0f = jnp.floor(cx)
    fy = (cy - y0f)[:, None, None]; fx = (cx - x0f)[:, None, None]
    yi = jnp.clip(y0f.astype(jnp.int32) - r, 0, H - p - 1)
    xi = jnp.clip(x0f.astype(jnp.int32) - r, 0, W - p - 1)
    sl = jax.vmap(lambda y, x: lax.dynamic_slice(image, (y, x), (p+1, p+1)))(yi, xi)
    return ((1-fy)*(1-fx)*sl[:, :p, :p] + (1-fy)*fx*sl[:, :p, 1:]
            + fy*(1-fx)*sl[:, 1:, :p] + fy*fx*sl[:, 1:, 1:])

def sample_gather(image, cy, cx):
    y0f = jnp.floor(cy); x0f = jnp.floor(cx)
    fy = (cy - y0f)[:, None, None]; fx = (cx - x0f)[:, None, None]
    yi = jnp.clip(y0f.astype(jnp.int32) - r, 0, H - p - 1)
    xi = jnp.clip(x0f.astype(jnp.int32) - r, 0, W - p - 1)
    dy = jnp.arange(p+1); dx = jnp.arange(p+1)
    flat = (yi[:,None,None]+dy[None,:,None])*W + (xi[:,None,None]+dx[None,None,:])
    sl = jnp.take(image.ravel(), flat)
    return ((1-fy)*(1-fx)*sl[:, :p, :p] + (1-fy)*fx*sl[:, :p, 1:]
            + fy*(1-fx)*sl[:, 1:, :p] + fy*fx*sl[:, 1:, 1:])

def chain(fn, iters=20):
    @jax.jit
    def run(cy, cx):
        def body(i, st):
            cy, cx = st
            patch = fn(img, cy, cx)
            d = jnp.mean(patch, axis=(1,2)) * 1e-6   # force dependency
            return cy + d, cx + d
        return lax.fori_loop(0, iters, body, (cy, cx))
    out = run(cy0, cx0); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(5): out = run(cy0, cx0)
    jax.block_until_ready(out)
    return (time.perf_counter()-t0)/5/iters*1000

print("dynamic_slice chain: %.3f ms/iter" % chain(sample_ds), flush=True)
print("flat-gather chain:   %.3f ms/iter" % chain(sample_gather), flush=True)
