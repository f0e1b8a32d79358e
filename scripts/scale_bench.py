"""Problem-size scaling of the single-chip production path (round 4).

Runs the bench solve (int8 Morton Pallas operators, fused residual,
hybrid BA-GMRES, maxit=100) at growing CT sizes and reports wall it/s and
the effective panel-stream bandwidth — the check that the framework stays
BANDWIDTH-bound (not dispatch- or overhead-bound) as the operator grows.

    python scripts/scale_bench.py [--sizes 64,128]

Measured (v5e, one chip via tunnel):

| n | rays | nnz(A)+nnz(B) | panels | wall it/s | wall GB/s | device GB/s |
|---|---|---|---|---|---|---|
| 64 | 32400 | 4.5M | 61 MB | ~2550 | 156 | ~427 |
| 128 | 129600 | 38M | 467 MB | ~911 | 425 | ~531 |

The device-effective bandwidth IMPROVES at 4x the problem (relative
CGS2/solve overhead shrinks), and the wall number closes on it as the
fixed ~22 ms tunnel dispatch amortizes over the longer device program.
"""

import argparse
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="64,128")
    ap.add_argument("--maxit", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hybrid_gmres_tpu.problems.ct import ct_mismatched, ct_tpu_operators
    from hybrid_gmres_tpu.solvers.gmres import ba_gmres

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    maxit = args.maxit
    for n in (int(s) for s in args.sizes.split(",")):
        ang = det = int(180 * n / 64)
        t0 = time.time()
        prob = ct_mismatched(n=n, n_angles=ang, n_det=det, dense=False)
        A_op, B_op, _, x_true, ray_perm, pix_perm = ct_tpu_operators(
            prob, dtype=jnp.int8, n_buckets=8)
        rng = np.random.default_rng(0)
        e = rng.standard_normal(prob.b_exact.shape)
        e = e / np.linalg.norm(e) * 0.25 * float(
            np.linalg.norm(prob.b_exact))
        b = jnp.asarray((np.asarray(prob.b_exact) + e)[np.asarray(ray_perm)],
                        dtype=jnp.float32)
        xt = jnp.asarray(np.asarray(prob.x_true)[np.asarray(pix_perm)],
                         dtype=jnp.float32)
        setup = time.time() - t0

        @jax.jit
        def solve(A, B, bb, x):
            return ba_gmres(A, B, bb, x, tol=0.0, maxit=maxit, lam=1e-2,
                            residual="fused")

        r = solve(A_op, B_op, b, xt)
        jax.block_until_ready(r.x)
        float(jnp.sum(r.x))
        ts = []
        for _ in range(6):
            t0 = time.time()
            r = solve(A_op, B_op, b, xt)
            jax.block_until_ready(r.x)
            ts.append(time.time() - t0)
        float(jnp.sum(r.x))
        dt = min(ts)
        stream = A_op.fwd.nbytes + B_op.fwd.nbytes
        print(f"n={n:4d} ({ang}x{det}, nnz {prob.A_csr.nnz/1e6:.1f}M+"
              f"{prob.B_csr.nnz/1e6:.1f}M, panels {stream/1e6:.0f}MB, "
              f"setup {setup:.0f}s): {maxit/dt:7.1f} it/s wall, "
              f"{stream*maxit/dt/1e9:5.0f} GB/s-equiv, "
              f"min err {float(np.nanmin(np.asarray(r.err_hist))):.4f}")


if __name__ == "__main__":
    main()
