"""Sharded-BA scaling on a virtual device mesh.

BASELINE.md asks for scaling measured at 1 chip / 1 host / >=2 hosts;
multi-chip hardware is not available in this environment, so this script
demonstrates the scaling BEHAVIOR of the distributed LM-Schur solver on
the virtual 8-device CPU mesh (the same code path the driver dry-runs
and `tests/test_multihost.py` exercises across two real processes over
DCN).  Numbers are CPU-mesh functional measurements, not ICI
performance.

Weak scaling: points per device held fixed, devices 1 -> 8.
"""

import os
import time

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.sharding import Mesh

from boofcv_tpu.geo import ba
from boofcv_tpu.dist import ba_sharded, mesh as mesh_mod


def make_problem(P, V=64, L=6, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.stack([rng.uniform(-4, 4, P), rng.uniform(-2, 2, P),
                    rng.uniform(4, 20, P)], 1)
    ang = 0.004 * np.arange(V)
    ca, sa = np.cos(ang), np.sin(ang)
    Rs = np.zeros((V, 3, 3))
    Rs[:, 0, 0], Rs[:, 0, 2] = ca, sa
    Rs[:, 1, 1] = 1.0
    Rs[:, 2, 0], Rs[:, 2, 2] = -sa, ca
    cs = np.stack([0.04 * np.arange(V), np.zeros(V), 0.2 * np.arange(V)], 1)
    ts = -np.einsum("vij,vj->vi", Rs, cs)
    first = rng.integers(0, V - L, P)
    views = first[:, None] + np.arange(L)[None, :]
    pc = np.einsum("plij,pj->pli", Rs[views], pts) + ts[views]
    valid = pc[..., 2] > 0.5
    z = np.where(np.abs(pc[..., 2]) < 1e-9, 1e-9, pc[..., 2])
    obs = pc[..., :2] / z[..., None] + rng.normal(0, 5e-4, (P, L, 2))
    fixed = np.zeros(V, bool)
    fixed[:2] = True
    return ba.make_problem(
        Rs, ts + rng.normal(0, 0.01, ts.shape),
        pts + rng.normal(0, 0.05, pts.shape), obs,
        np.where(valid, views, 0).astype(np.int32), valid,
        fixed_views=fixed, dtype=jnp.float32)


def main():
    per_dev = 1500
    devs = jax.devices()
    print(f"devices: {len(devs)} ({devs[0].platform})")
    results = []
    for n in (1, 2, 4, 8):
        prob = make_problem(per_dev * n, seed=1)
        m = Mesh(np.array(devs[:n]), (mesh_mod.SHARD_AXIS,))
        out, info = ba_sharded.optimize_sharded(prob, m, iterations=5)
        jax.block_until_ready(out.points)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out, info = ba_sharded.optimize_sharded(prob, m, iterations=5)
            jax.block_until_ready(out.points)
        ms = (time.perf_counter() - t0) / reps * 1e3
        results.append((n, per_dev * n, ms, float(info["final_cost"])))
        print(f"n_devices={n}  points={per_dev*n:5d}  "
              f"{ms:7.1f} ms/5-iter solve  final_cost={results[-1][3]:.3e}",
              flush=True)
    base = results[0][2]
    print("\nweak-scaling efficiency vs 1 device:")
    for n, P, ms, _ in results:
        print(f"  {n}x devices, {n}x problem: {base / ms * 100:5.1f}%")


if __name__ == "__main__":
    main()
