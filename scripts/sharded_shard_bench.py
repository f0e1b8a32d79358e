"""Single-shard throughput of the sharded-Pallas path vs the single-chip
path (the DESIGN.md §7 mesh-uniform-overhead number, VERDICT r2 #1).

Runs the CT n=64 hybrid BA-GMRES bench scenario twice on one real chip:

  * the single-chip production path (``ba_gmres`` + ``ct_tpu_operators``
    fused-residual, the bench.py configuration);
  * the SHARDED solver (``ba_gmres_sharded_pallas``) under a 1-device mesh
    with non-interpret kernels — same math, but through shard_map, the
    mesh-uniform panel padding, and the (degenerate) collectives.

The gap quantifies what the distributed code path itself costs per shard.

    python scripts/sharded_shard_bench.py [--maxit 100] [--dtype int8]
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--maxit", type=int, default=100)
    ap.add_argument("--dtype", default="int8")
    ap.add_argument("--b-layout", choices=["transposed", "forward", "both"],
                    default="both",
                    help="back-projector panel layout: transposed kernel of "
                         "the ray-major B^T panel (reduce_scatter schedule) "
                         "vs forward kernel of B's own pixel rows (gather "
                         "schedule, the single-chip kernel configuration)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    from hybrid_gmres_tpu.ops.ordering import morton_perm
    from hybrid_gmres_tpu.problems.ct import ct_mismatched, ct_tpu_operators
    from hybrid_gmres_tpu.solvers.gmres import ba_gmres
    from hybrid_gmres_tpu.parallel import (
        ba_gmres_sharded_pallas, make_mesh, shard_bucketed_panels)

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    maxit = args.maxit
    prob = ct_mismatched(n=64, n_angles=180, n_det=180, dense=False)
    A_csr = prob.A_csr.astype(np.float32)
    B_csr = prob.B_csr.astype(np.float32)

    rng = np.random.default_rng(0)
    e = rng.standard_normal(prob.b_exact.shape)
    e = e / np.linalg.norm(e) * 0.25 * float(np.linalg.norm(prob.b_exact))
    b = (np.asarray(prob.b_exact) + e).astype(np.float32)
    x_true = np.asarray(prob.x_true).astype(np.float32)

    def timed(fn, *a):
        r = fn(*a)
        jax.block_until_ready(r.x)
        float(jnp.sum(r.x))  # compile + forced completion (CLAUDE.md)
        times = []
        for _ in range(5):
            t0 = time.time()
            r = fn(*a)
            jax.block_until_ready(r.x)
            times.append(time.time() - t0)
        float(jnp.sum(r.x))
        return min(times), r

    # --- single-chip production path (bench.py configuration) ---
    A_op, B_op, _, xt_p, ray_perm, pix_perm = ct_tpu_operators(
        prob, dtype=(jnp.int8 if args.dtype == "int8" else args.dtype),
        n_buckets=8)
    bp = jnp.asarray(b[np.asarray(ray_perm)])
    xtp = jnp.asarray(x_true[np.asarray(pix_perm)])

    @jax.jit
    def single(A, B, bb, xt):
        return ba_gmres(A, B, bb, xt, tol=0.0, maxit=maxit, lam=1e-2,
                        residual="fused")

    dt1, r1 = timed(single, A_op, B_op, bp, xtp)
    print(f"single-chip: {maxit / dt1:8.1f} it/s  (min err "
          f"{float(np.nanmin(np.asarray(r1.err_hist))):.4f})")

    # --- sharded path, 1-device mesh, real Mosaic ---
    # same Morton relabeling so the panels match the single-chip layout
    rp = np.asarray(ray_perm)
    pp = np.asarray(pix_perm)
    A_m = A_csr[rp][:, pp].tocsr()
    B_m = B_csr[pp][:, rp].tocsr()
    # match the single-chip panel tuning: A (32,128) blocks, quantized B
    # (applied through the transposed kernel of its ray-major B^T panel)
    A_panels = shard_bucketed_panels(A_m, 1, block=(32, 128),
                                     dtype=args.dtype, n_buckets=8,
                                     row_group=8)
    mesh = make_mesh(1)
    bj, xtj = jnp.asarray(b[rp]), jnp.asarray(x_true[pp])

    layouts = (["transposed", "forward"] if args.b_layout == "both"
               else [args.b_layout])
    for layout in layouts:
        if layout == "transposed":
            BT_panels = shard_bucketed_panels(B_m.T.tocsr(), 1,
                                              dtype=args.dtype, n_buckets=8)
            B_panels = None
        else:
            # forward layout: B's own pixel rows, the single-chip (8,128)
            # kernel configuration
            BT_panels = None
            B_panels = shard_bucketed_panels(B_m, 1, dtype=args.dtype,
                                             n_buckets=8)

        @jax.jit
        def sharded(Ap, BTp, Bp, bb, xt):
            # the shard_map must run under jit — eagerly it dispatches each
            # primitive through the tunnel (~25 ms apiece)
            return ba_gmres_sharded_pallas(Ap, BTp, bb, xt, tol=0.0,
                                           maxit=maxit, lam=1e-2, mesh=mesh,
                                           interpret=False, B_panels=Bp)

        dt2, r2 = timed(sharded, A_panels, BT_panels, B_panels, bj, xtj)
        print(f"sharded p=1 [{layout:10s}]: {maxit / dt2:8.1f} it/s  "
              f"(min err {float(np.nanmin(np.asarray(r2.err_hist))):.4f})  "
              f"ratio vs single: {dt1 / dt2:.3f}")


if __name__ == "__main__":
    main()
