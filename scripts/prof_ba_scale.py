import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
"""Profile BA at the scale the PCG/sharded path exists for:
V=1000 views / 100k points, synthesized as a BAL-format problem
(io/bal.py round-trip), solved:

  (a) single-chip dense-Cholesky LM (geo/ba.py), and
  (b) point-sharded + row-scattered PCG (dist/ba_sharded.py) on an
      8-device mesh (virtual CPU mesh by default; real pod if present).

Usage:
  python scripts/prof_ba_scale.py            # real backend (TPU)
  JAX_PLATFORMS=cpu python scripts/prof_ba_scale.py --mesh  # virtual mesh

Prints per-config solve ms + final costs for PROFILE.md.
"""

import argparse
import sys
import tempfile
import time

import numpy as np


def big_scene(V=1000, P=100_000, L=6, seed=5, noise=3e-4):
    rng = np.random.default_rng(seed)
    pts = np.stack([rng.uniform(-8, 8, P), rng.uniform(-4, 4, P),
                    rng.uniform(4, 40, P)], 1)
    ang = 0.001 * np.arange(V)
    ca, sa = np.cos(ang), np.sin(ang)
    Rs = np.zeros((V, 3, 3))
    Rs[:, 0, 0], Rs[:, 0, 2] = ca, sa
    Rs[:, 1, 1] = 1.0
    Rs[:, 2, 0], Rs[:, 2, 2] = -sa, ca
    cs = np.stack([0.008 * np.arange(V), np.zeros(V),
                   0.02 * np.arange(V)], 1)
    ts = -np.einsum("vij,vj->vi", Rs, cs)
    first = rng.integers(0, V - L, P)
    views = first[:, None] + np.arange(L)[None, :]
    pc = np.einsum("plij,pj->pli", Rs[views], pts) + ts[views]
    ov = pc[..., 2] >= 0.5
    z = np.where(np.abs(pc[..., 2]) < 1e-12, 1e-12, pc[..., 2])
    oxy = pc[..., :2] / z[..., None] + rng.normal(0, noise, (P, L, 2))
    oxy[~ov] = 0.0
    obs_view = np.where(ov, views, 0).astype(np.int32)
    fixed = np.zeros(V, bool)
    fixed[:2] = True
    ts_n = ts + rng.normal(0, 0.004, ts.shape)
    pts_n = pts + rng.normal(0, 0.02, pts.shape)
    return Rs, ts_n, pts_n, oxy, obs_view, ov, fixed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", action="store_true",
                    help="force 8 virtual CPU devices for the sharded leg")
    ap.add_argument("--views", type=int, default=1000)
    ap.add_argument("--points", type=int, default=100_000)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--pcg-iters", type=int, default=100)
    ap.add_argument("--skip-dense", action="store_true")
    ap.add_argument("--single", action="store_true",
                    help="run the sharded legs even on a 1-device mesh "
                         "(the real-chip PCG-at-scale config: psum/"
                         "psum_scatter/all_gather degenerate to identity, "
                         "leaving the row-slab PCG solve — the path that "
                         "avoids the dense [VD,VD] Cholesky workspace "
                         "that OOMs the chip at V=1000)")
    ap.add_argument("--skip-cholesky", action="store_true",
                    help="skip the sharded-cholesky leg (it replicates "
                         "the full reduced system — OOMs where dense does)")
    args = ap.parse_args()

    import os
    if args.mesh:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
    import jax
    if args.mesh or os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        # honor an explicit CPU request even though the site hook pins
        # the tunneled TPU platform
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from boofcv_tpu.geo import ba
    from boofcv_tpu.io import bal
    from boofcv_tpu.dist import make_mesh, ba_sharded

    print(f"devices: {jax.devices()}", file=sys.stderr)
    Rs, ts, pts, oxy, ov_idx, oval, fixed = big_scene(args.views,
                                                      args.points)
    prob = ba.make_problem(Rs, ts, pts, oxy, ov_idx, oval,
                           fixed_views=fixed, dtype=jnp.float32)
    # BAL round-trip: the problem is expressible in the interop format
    # (BAL cameras carry 3 intrinsics -> pad; host device: write_bal's
    # per-view log_so3 would pay a tunnel round-trip each on the TPU)
    with tempfile.NamedTemporaryFile(suffix=".txt", delete=False) as f:
        path = f.name
    t0 = time.perf_counter()
    with jax.default_device(jax.devices("cpu")[0]):
        write_prob = prob._replace(
            intr=jnp.zeros((prob.R.shape[0], 3)), model="snavely")
        bal.write_bal(path, write_prob)
        data = bal.read_bal(path)
    print(f"# BAL round-trip ({len(data['obs'])} obs): "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    if not args.skip_dense:
        t0 = time.perf_counter()
        out, info = ba.optimize(prob, iterations=args.iters)
        np.asarray(out.points[:1])   # forced sync: block_until_ready is a no-op on the tunnel
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out, info = ba.optimize(prob, iterations=args.iters)
        np.asarray(out.points[:1])   # forced sync: block_until_ready is a no-op on the tunnel
        ms = (time.perf_counter() - t0) * 1000.0
        print(f"single-chip dense LM ({args.views}v/{args.points}p/"
              f"{args.iters}it): {ms:.0f} ms (compile {compile_s:.0f}s), "
              f"cost {float(info['final_cost']):.4e}")

    mesh = make_mesh()
    n = mesh.devices.size
    if n < 2 and not args.single:
        print("single-device backend: skipping sharded leg "
              "(rerun with --mesh, or --single for the 1-device PCG row)",
              file=sys.stderr)
        return
    legs = [("pcg", {"pcg_iterations": args.pcg_iters})]
    if not args.skip_cholesky:
        legs.append(("cholesky", {}))
    for solver, extra in legs:
        t0 = time.perf_counter()
        out, info = ba_sharded.optimize_sharded(
            prob, mesh, iterations=args.iters, reduced_solver=solver,
            **extra)
        np.asarray(out.points[:1])   # forced sync: block_until_ready is a no-op on the tunnel
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        out, info = ba_sharded.optimize_sharded(
            prob, mesh, iterations=args.iters, reduced_solver=solver,
            **extra)
        np.asarray(out.points[:1])   # forced sync: block_until_ready is a no-op on the tunnel
        ms = (time.perf_counter() - t0) * 1000.0
        print(f"{n}-device {solver} ({args.views}v/{args.points}p/"
              f"{args.iters}it): {ms:.0f} ms (compile {compile_s:.0f}s), "
              f"cost {float(info['final_cost']):.4e}")
        try:
            st = jax.local_devices()[0].memory_stats() or {}
            used = st.get("bytes_in_use") or st.get("peak_bytes_in_use")
            peak = st.get("peak_bytes_in_use")
            lim = st.get("bytes_limit")
            if used is not None:
                print(f"  hbm: in_use {used/2**30:.2f} GiB, "
                      f"peak {0 if peak is None else peak/2**30:.2f} GiB"
                      + ("" if lim is None
                         else f", limit {lim/2**30:.2f} GiB"),
                      file=sys.stderr)
        except Exception as e:          # memory_stats is backend-optional
            print(f"  hbm stats unavailable: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
