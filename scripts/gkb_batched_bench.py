"""GKB serving-batch benchmark: R simultaneous LSQR/hybrid-LSQR
reconstructions through the multi-RHS SpMM kernels vs R sequential
single-RHS solves (the GKB twin of scripts/batched_bench.py).

    python scripts/gkb_batched_bench.py [--maxit 100] [--R 8] [--solver lsqr]

Same CT n=64 int8 forward-adjoint regime as the GKB rows of DESIGN §13;
per-RHS noise realizations differ (seeds 0..R-1).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--maxit", type=int, default=100)
    ap.add_argument("--R", type=int, default=8)
    ap.add_argument("--solver", default="lsqr",
                    choices=["lsqr", "hybrid_lsqr", "lsmr"])
    ap.add_argument("--lam", type=float, default=1e-2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hybrid_gmres_tpu.problems.ct import ct_mismatched, ct_tpu_operators
    from hybrid_gmres_tpu.solvers.lsqr import hybrid_lsqr, lsqr
    from hybrid_gmres_tpu.solvers.lsmr import lsmr
    from hybrid_gmres_tpu.solvers.gkb_batched import (
        hybrid_lsqr_batched, lsmr_batched, lsqr_batched)

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    maxit, R = args.maxit, args.R
    prob = ct_mismatched(n=64, n_angles=180, n_det=180, dense=False)
    # the GKB family needs the exact adjoint pair: int8 shared-quantization
    # forward-layout A^T panel (DESIGN §12)
    A_op, _, _, x_true, ray_perm, _ = ct_tpu_operators(
        prob, dtype=jnp.int8, n_buckets=8, with_adjoint=True)
    rp = np.asarray(ray_perm)
    b_ex = np.asarray(prob.b_exact)
    cols = []
    for r in range(R):
        rng = np.random.default_rng(r)
        e = rng.standard_normal(b_ex.shape)
        e = e / np.linalg.norm(e) * 0.25 * float(np.linalg.norm(b_ex))
        cols.append((b_ex + e).astype(np.float32)[rp])
    b_batch = jnp.asarray(np.stack(cols, axis=1))
    xt = jnp.asarray(np.asarray(x_true)).astype(jnp.float32)

    single_fns = {"lsqr": lsqr, "hybrid_lsqr": hybrid_lsqr, "lsmr": lsmr}
    batched_fns = {"lsqr": lsqr_batched, "hybrid_lsqr": hybrid_lsqr_batched,
                   "lsmr": lsmr_batched}
    kw = {"lam": args.lam} if args.solver == "hybrid_lsqr" else {}
    sf, bf = single_fns[args.solver], batched_fns[args.solver]

    @jax.jit
    def batched(A, bb, x):
        return bf(A, bb, x, tol=0.0, maxit=maxit, **kw)

    @jax.jit
    def single(A, bb, x):
        return sf(A, bb, x, tol=0.0, maxit=maxit, **kw)

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

    dt1, r1 = timed(single, A_op, b_batch[:, 0], xt)
    dtb, rb = timed(batched, A_op, b_batch, xt)
    min_errs = np.nanmin(np.asarray(rb.err_hist), axis=0)
    print(f"{args.solver} single-RHS : {maxit / dt1:8.1f} it/s "
          f"(min err {float(np.nanmin(np.asarray(r1.err_hist))):.4f})")
    print(f"{args.solver} batched R={R}: {maxit / dtb:8.1f} solver-it/s = "
          f"{R * maxit / dtb:8.1f} aggregate RHS-it/s "
          f"({R * dt1 / dtb:.2f}x vs {R} sequential solves)")
    print(f"per-RHS min-over-k errors: "
          f"{np.array2string(min_errs, precision=4)}")


if __name__ == "__main__":
    main()
