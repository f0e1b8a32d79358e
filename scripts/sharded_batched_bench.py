"""Sharded multi-RHS serving throughput on the real chip (DESIGN §13 /
VERDICT r4 #1): aggregate RHS-it/s of ``ba_gmres_sharded_batched`` under a
1-device mesh (real Mosaic SpMM kernels + degenerate collectives) vs the
single-chip ``ba_gmres_batched`` and R sequential single-RHS solves.

    python scripts/sharded_batched_bench.py [--maxit 100] [--R 8]
            [--b-layout transposed|forward|both] [--defer]

Same CT n=64 scenario and quality regime as bench.py; per-RHS noise
realizations differ (seeds 0..R-1).
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--maxit", type=int, default=100)
    ap.add_argument("--R", type=int, default=8)
    ap.add_argument("--dtype", default="int8")
    ap.add_argument("--defer", action="store_true")
    ap.add_argument("--b-layout", choices=["transposed", "forward", "both"],
                    default="both")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hybrid_gmres_tpu.problems.ct import ct_mismatched, ct_tpu_operators
    from hybrid_gmres_tpu.solvers.batched import ba_gmres_batched
    from hybrid_gmres_tpu.parallel import (
        ba_gmres_sharded_batched, make_mesh, shard_bucketed_panels)

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    maxit, R = args.maxit, args.R
    prob = ct_mismatched(n=64, n_angles=180, n_det=180, dense=False)
    A_csr = prob.A_csr.astype(np.float32)
    B_csr = prob.B_csr.astype(np.float32)

    # single-chip reference path (bench.py batched configuration)
    A_op, B_op, _, x_true, ray_perm, pix_perm = ct_tpu_operators(
        prob, dtype=jnp.int8, n_buckets=8)
    rp, pp = np.asarray(ray_perm), np.asarray(pix_perm)
    b_ex = np.asarray(prob.b_exact)
    cols = []
    for r in range(R):
        rng = np.random.default_rng(r)
        e = rng.standard_normal(b_ex.shape)
        e = e / np.linalg.norm(e) * 0.25 * float(np.linalg.norm(b_ex))
        cols.append((b_ex + e).astype(np.float32)[rp])
    b_batch = jnp.asarray(np.stack(cols, axis=1))
    xt = jnp.asarray(np.asarray(x_true)).astype(jnp.float32)

    def timed(fn, *a):
        r = fn(*a)
        jax.block_until_ready(r.x)
        float(jnp.sum(r.x))
        ts = []
        for _ in range(3):
            t0 = time.time()
            r = fn(*a)
            jax.block_until_ready(r.x)
            ts.append(time.time() - t0)
        float(jnp.sum(r.x))
        return min(ts), r

    @jax.jit
    def single_chip(A, B, bb, x):
        return ba_gmres_batched(A, B, bb, x, tol=0.0, maxit=maxit, lam=1e-2,
                                chunk_rhs=8, defer_histories=args.defer)

    dt1, r1 = timed(single_chip, A_op, B_op, b_batch, xt)
    min1 = np.nanmin(np.asarray(r1.err_hist), axis=0)
    print(f"single-chip batched R={R}: {R * maxit / dt1:8.1f} agg RHS-it/s "
          f"(min errs {np.array2string(min1, precision=4)})")

    # sharded path: same Morton relabeling so panels match the tuned layout
    A_m = A_csr[rp][:, pp].tocsr()
    B_m = B_csr[pp][:, rp].tocsr()
    A_panels = shard_bucketed_panels(A_m, 1, block=(32, 128),
                                     dtype=args.dtype, n_buckets=8,
                                     row_group=8)
    mesh = make_mesh(1)
    layouts = (["transposed", "forward"] if args.b_layout == "both"
               else [args.b_layout])
    for layout in layouts:
        if layout == "transposed":
            BT_panels = shard_bucketed_panels(B_m.T.tocsr(), 1,
                                              dtype=args.dtype, n_buckets=8)
            B_panels = None
        else:
            BT_panels = None
            B_panels = shard_bucketed_panels(B_m, 1, dtype=args.dtype,
                                             n_buckets=8)

        @jax.jit
        def sharded(Ap, BTp, Bp, bb, x):
            return ba_gmres_sharded_batched(
                Ap, BTp, bb, x, tol=0.0, maxit=maxit, lam=1e-2, mesh=mesh,
                interpret=False, B_panels=Bp, chunk_rhs=8,
                defer_histories=args.defer)

        dt2, r2 = timed(sharded, A_panels, BT_panels, B_panels, b_batch, xt)
        min2 = np.nanmin(np.asarray(r2.err_hist), axis=0)
        print(f"sharded p=1 [{layout:10s}] R={R}: {R * maxit / dt2:8.1f} "
              f"agg RHS-it/s  ratio vs single-chip: {dt1 / dt2:.3f}  "
              f"(min errs {np.array2string(min2, precision=4)})")


if __name__ == "__main__":
    main()
