"""Benchmark: hybrid BA-GMRES iteration throughput at Krylov dim 100.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
Details go to stderr.

Scenario: fan-beam CT (n=64 image -> 4096 px, 180 angles x 180 detectors ->
m=32400 rays), mismatched back-projector, f32, maxit=100 with full
per-iteration projected Tikhonov solves and residual/error tracking — the
same work the reference does per iteration (BAgmres_hybrid_bounds.m:24-40,
minus the O(n^3) bounds instrumentation, which is optional there too).

Baseline: the reference is single-threaded MATLAB (SURVEY.md §6 — no
published numbers).  We use a nominal 10 iterations/s for this problem size
on a modern CPU: per iteration the reference's loop does 2 dense matvecs
(2 x 2*32400*4096 = 0.53 GFLOP) plus MGS and a k x k solve; at an effective
~6 GFLOP/s that is ~0.1 s/iter.  vs_baseline = measured / 10.
"""

import json
import sys
import time

import numpy as np


BASELINE_ITERS_PER_SEC = 10.0


def main():
    import jax
    import jax.numpy as jnp
    from hybrid_gmres_tpu.problems.ct import ct_mismatched
    from hybrid_gmres_tpu.solvers.gmres import ba_gmres

    maxit = 100
    t0 = time.time()
    prob = ct_mismatched(n=64, n_angles=180, n_det=180, dtype=jnp.float32)
    print(f"[bench] CT assembly: {time.time()-t0:.1f}s  A={prob.A.shape} "
          f"nnz(A)={prob.A_csr.nnz}", file=sys.stderr)

    rng = np.random.default_rng(0)
    e = rng.standard_normal(prob.b_exact.shape)
    e = e / np.linalg.norm(e) * 0.25 * float(jnp.linalg.norm(prob.b_exact))
    b = prob.b_exact + jnp.asarray(e, dtype=jnp.float32)

    @jax.jit
    def _solve(A, B, bb, xt):
        return ba_gmres(A, B, bb, xt, tol=0.0, maxit=maxit, lam=1e-2)

    def run():
        return _solve(prob.A, prob.B, b, prob.x_true)

    t0 = time.time()
    r = run()
    jax.block_until_ready(r.x)
    print(f"[bench] compile+first run: {time.time()-t0:.1f}s", file=sys.stderr)

    times = []
    for _ in range(3):
        t0 = time.time()
        r = run()
        jax.block_until_ready(r.x)
        times.append(time.time() - t0)
    dt = min(times)
    iters_per_sec = maxit / dt
    err = float(r.err_hist[int(r.niters) - 1])
    nnz_per_sec = 2.0 * (prob.A_csr.nnz + prob.B_csr.nnz) * iters_per_sec
    print(f"[bench] {maxit} iters in {dt:.3f}s -> {iters_per_sec:.1f} it/s; "
          f"final rel-err {err:.3f}; equiv dense nnz/s {nnz_per_sec:.3e}",
          file=sys.stderr)

    print(json.dumps({
        "metric": "hybrid_ba_gmres_iters_per_sec_m100_ct64",
        "value": round(iters_per_sec, 2),
        "unit": "iterations/s",
        "vs_baseline": round(iters_per_sec / BASELINE_ITERS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
