"""Serving-batch benchmark: R simultaneous hybrid BA-GMRES reconstructions
through the multi-RHS SpMM kernels vs R sequential single-RHS solves.

    python scripts/batched_bench.py [--maxit 100] [--R 8]

The DESIGN.md §13 numbers.  Same CT n=64 scenario and quality regime as
bench.py; per-RHS noise realizations differ (seeds 0..R-1).
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--maxit", type=int, default=100)
    ap.add_argument("--R", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hybrid_gmres_tpu.problems.ct import ct_mismatched, ct_tpu_operators
    from hybrid_gmres_tpu.solvers.gmres import ba_gmres
    from hybrid_gmres_tpu.solvers.batched import ba_gmres_batched

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    maxit, R = args.maxit, args.R
    prob = ct_mismatched(n=64, n_angles=180, n_det=180, dense=False)
    A_op, B_op, _, x_true, ray_perm, pix_perm = ct_tpu_operators(
        prob, dtype=jnp.int8, n_buckets=8)
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

    @jax.jit
    def batched(A, B, bb, x):
        return ba_gmres_batched(A, B, bb, x, tol=0.0, maxit=maxit, lam=1e-2)

    @jax.jit
    def single(A, B, bb, x):
        return ba_gmres(A, B, bb, x, tol=0.0, maxit=maxit, lam=1e-2,
                        residual="fused")

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

    dt1, r1 = timed(single, A_op, B_op, b_batch[:, 0], xt)
    dtb, rb = timed(batched, A_op, B_op, b_batch, xt)
    min_errs = np.nanmin(np.asarray(rb.err_hist), axis=0)
    print(f"single-RHS : {maxit / dt1:8.1f} it/s "
          f"(min err {float(np.nanmin(np.asarray(r1.err_hist))):.4f})")
    print(f"batched R={R}: {maxit / dtb:8.1f} solver-it/s = "
          f"{R * maxit / dtb:8.1f} aggregate RHS-it/s "
          f"({R * dt1 / dtb:.2f}x vs {R} sequential solves)")
    print(f"per-RHS min-over-k errors: "
          f"{np.array2string(min_errs, precision=4)}")


if __name__ == "__main__":
    main()
