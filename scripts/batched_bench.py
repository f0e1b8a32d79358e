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
    ap.add_argument("--chunk", type=int, default=8,
                    help="chunk_rhs passed to the batched solver "
                         "(0 = disable chunking)")
    ap.add_argument("--defer", action="store_true",
                    help="defer_histories=True on the batched solver "
                         "(Arnoldi-only scan, post-scan histories)")
    ap.add_argument("--lam", default="1e-2",
                    help="scalar, 'gcv' (per-iteration adaptive) or "
                         "'gcv-final' (serving-grade one-shot per-RHS "
                         "adaptive; needs --defer)")
    ap.add_argument("--warm", action="store_true",
                    help="also measure the serving warm-start scenario: "
                         "reconstruct a perturbed successive frame cold vs "
                         "warm-started from the previous frame's solution")
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

    chunk = None if args.chunk == 0 else args.chunk
    lam = args.lam if args.lam.startswith("gcv") else float(args.lam)
    print(f"lam: {lam}", file=sys.stderr)

    @jax.jit
    def batched(A, B, bb, x):
        return ba_gmres_batched(A, B, bb, x, tol=0.0, maxit=maxit, lam=lam,
                                chunk_rhs=chunk,
                                defer_histories=args.defer)

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

    if args.warm:
        # Serving scenario (DESIGN §13 / VERDICT r3 #2): successive frames
        # of the same object with fresh noise realizations (seeds R..2R-1);
        # frame t warm-starts from frame t-1's solution.  The metric is
        # iterations to reach the bench quality gate (min-err * 1.03).
        gate = 0.4328 * 1.03
        cols2 = []
        for r in range(R):
            rng = np.random.default_rng(R + r)
            e = rng.standard_normal(b_ex.shape)
            e = e / np.linalg.norm(e) * 0.25 * float(np.linalg.norm(b_ex))
            cols2.append((b_ex + e).astype(np.float32)[rp])
        b2 = jnp.asarray(np.stack(cols2, axis=1))

        @jax.jit
        def solve2(A, B, bb, x, x0):
            return ba_gmres_batched(A, B, bb, x, tol=0.0, maxit=maxit,
                                    lam=1e-2, chunk_rhs=chunk, x0=x0)

        # frame-1 solution at its semi-convergence minimum (per RHS)
        errs1 = np.asarray(rb.err_hist)
        # x at min is not stored per-k; serving would stop at the gate —
        # rerun frame 1 with maxit at the (max) gate-crossing iteration.
        # argmax on an all-False column would silently give 0: any RHS
        # that never crosses pins the stop to its full history instead.
        hits = errs1 <= gate
        per_rhs = np.where(hits.any(axis=0), np.argmax(hits, axis=0),
                           errs1.shape[0] - 1)
        k_gate1 = int(np.max(per_rhs)) + 1

        @jax.jit
        def solve_stop(A, B, bb, x):
            return ba_gmres_batched(A, B, bb, x, tol=0.0, maxit=k_gate1,
                                    lam=1e-2, chunk_rhs=chunk)

        r_prev = solve_stop(A_op, B_op, b_batch, xt)
        jax.block_until_ready(r_prev.x)

        dt_cold, r_cold = timed(solve2, A_op, B_op, b2, xt,
                                jnp.zeros_like(r_prev.x))
        dt_warm, r_warm = timed(solve2, A_op, B_op, b2, xt, r_prev.x)

        def iters_to_gate(res):
            e = np.asarray(res.err_hist)
            hit = e <= gate
            k = np.where(hit.any(axis=0), np.argmax(hit, axis=0) + 1, -1)
            return k

        kc, kw = iters_to_gate(r_cold), iters_to_gate(r_warm)
        print(f"warm-start serving (gate err<={gate:.4f}): cold "
              f"iters-to-gate {kc}, warm {kw} "
              f"(saving {np.mean(kc - kw):.1f} iters/frame avg; frame-1 "
              f"stop k={k_gate1})")
        print(f"warm min-over-k errors: "
              f"{np.array2string(np.nanmin(np.asarray(r_warm.err_hist), axis=0), precision=4)}")


if __name__ == "__main__":
    main()
