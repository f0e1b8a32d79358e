"""Per-iteration DEVICE budget of the single-chip hybrid BA-GMRES bench
(VERDICT r3 #3): where do the ~187 us/iter go once the ~20 ms tunnel
dispatch is subtracted?

Method: every variant runs R complete solves inside ONE jit (an outer
scan whose carry multiplies the RHS by an exactly-1.0 factor derived from
the previous result, so XLA cannot hoist or parallelize the repeats); the
R=1 vs R=3 slope is the pure device time of one solve at the ACTUAL bench
maxit — the fixed ~20 ms tunnel dispatch cancels, and (unlike a
maxit-scaling slope) the padded-shape-dependent terms (CGS2 reads the
full (n, maxit+1) basis, the projected solve factorizes (maxit, maxit)
every iteration) are measured at their true size.  Variants nest, so
successive differences isolate one term each:

  spmv      : A q -> B u -> normalize (the two Pallas SpMVs + one norm)
  +cgs2     : + the two-pass CGS2 against the full (n, maxit+1) basis
  +solve    : + the per-iteration projected Tikhonov solve (Cholesky)
  +resid    : + fused residual/error tracking (IMG @ y, x = Q y, norms)
              == the production ba_gmres(residual="fused") body
  full      : the production solver itself (cross-check: ~= +resid)
  defer     : production solver with defer_histories=True
  bf16q     : production solver with basis_dtype=bfloat16 (if supported)

    python scripts/device_budget_bench.py [--maxit 100] [--dtype int8]
"""

import argparse
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--maxit", type=int, default=100)
    ap.add_argument("--dtype", default="int8")
    ap.add_argument("--repeats", type=int, default=16)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from hybrid_gmres_tpu.problems.ct import ct_mismatched, ct_tpu_operators
    from hybrid_gmres_tpu.solvers.gmres import ba_gmres, _make_project_solve

    print(f"backend: {jax.default_backend()}", file=sys.stderr)
    prob = ct_mismatched(n=64, n_angles=180, n_det=180, dense=False)
    A_op, B_op, _, x_true, ray_perm, pix_perm = ct_tpu_operators(
        prob, dtype=(jnp.int8 if args.dtype == "int8" else args.dtype),
        n_buckets=8)
    rng = np.random.default_rng(0)
    e = rng.standard_normal(prob.b_exact.shape)
    e = e / np.linalg.norm(e) * 0.25 * float(np.linalg.norm(prob.b_exact))
    b = jnp.asarray((np.asarray(prob.b_exact) + e)[np.asarray(ray_perm)],
                    dtype=jnp.float32)
    xt = jnp.asarray(np.asarray(prob.x_true)[np.asarray(pix_perm)],
                     dtype=jnp.float32)
    m, n = A_op.shape
    lam = 1e-2

    from hybrid_gmres_tpu.utils.profiling import device_seconds

    def slope_us(build):
        """us/iter from the R=1 vs R=3 repeat slope via the shared
        utils.profiling.device_seconds (interleaved min-of-N; dispatch
        cancels, shapes stay at the true bench maxit).  The operators ride
        as fn ARGUMENTS — closing over the ~60MB panels would inline them
        into the axon remote-compile payload (CLAUDE.md)."""
        core = build(args.maxit)
        st = device_seconds(lambda bb, A, B: core(A, B, bb), b, A_op, B_op,
                            repeats=args.repeats, reps=(1, 3), stats=True)
        t1, t3 = min(st["ts_lo"]), min(st["ts_hi"])
        print(f"    raw mins: t1={t1*1e3:.1f}ms t3={t3*1e3:.1f}ms",
              file=sys.stderr)
        return st["slope_s"] / args.maxit * 1e6

    # --- variant builders (custom scans mirroring the gmres_core body) ---
    def build_spmv(maxit):
        def run(A_op, B_op, b_):
            r0 = B_op.matvec(b_)
            q0 = r0 / jnp.linalg.norm(r0)

            def body(q, _):
                u = A_op.matvec(q)
                w = B_op.matvec(u)
                return w / jnp.linalg.norm(w), ()

            qf, _ = jax.lax.scan(body, q0, jnp.arange(maxit))
            return qf
        return run

    def build_cgs2(maxit):
        def run(A_op, B_op, b_):
            r0 = B_op.matvec(b_)
            beta = jnp.linalg.norm(r0)
            Q0 = jnp.zeros((n, maxit + 1), jnp.float32).at[:, 0].set(
                r0 / beta)
            H0 = jnp.zeros((maxit + 1, maxit), jnp.float32)

            def body(carry, k):
                Q, H = carry
                u = A_op.matvec(Q[:, k])
                w = B_op.matvec(u)
                c1 = Q.T @ w
                w = w - Q @ c1
                c2 = Q.T @ w
                w = w - Q @ c2
                h = (c1 + c2).at[k + 1].set(jnp.linalg.norm(w))
                return (Q.at[:, k + 1].set(w / h[k + 1]), H.at[:, k].set(h)), ()

            (Q, H), _ = jax.lax.scan(body, (Q0, H0),
                                     jnp.arange(maxit, dtype=jnp.int32))
            return Q[:, -1]
        return run

    def build_solve(maxit):
        _ps = _make_project_solve(lam, n, None)

        def run(A_op, B_op, b_):
            r0 = B_op.matvec(b_)
            beta = jnp.linalg.norm(r0)
            Q0 = jnp.zeros((n, maxit + 1), jnp.float32).at[:, 0].set(
                r0 / beta)
            H0 = jnp.zeros((maxit + 1, maxit), jnp.float32)
            t = jnp.zeros((maxit + 1,), jnp.float32).at[0].set(beta)

            def body(carry, k):
                Q, H, acc = carry
                u = A_op.matvec(Q[:, k])
                w = B_op.matvec(u)
                c1 = Q.T @ w
                w = w - Q @ c1
                c2 = Q.T @ w
                w = w - Q @ c2
                h = (c1 + c2).at[k + 1].set(jnp.linalg.norm(w))
                Qn = Q.at[:, k + 1].set(w / h[k + 1])
                Hn = H.at[:, k].set(h)
                y = _ps(Hn, None, t, k + 1)
                return (Qn, Hn, acc + y[0]), ()

            (Q, H, acc), _ = jax.lax.scan(
                body, (Q0, H0, jnp.float32(0)),
                jnp.arange(maxit, dtype=jnp.int32))
            return Q[:, -1] + acc
        return run

    def build_full(maxit, **kw):
        def run(A_op, B_op, b_):
            r = ba_gmres(A_op, B_op, b_, xt, tol=0.0, maxit=maxit, lam=lam,
                         residual="fused", **kw)
            return r.x
        return run

    rows = []
    spmv = slope_us(build_spmv)
    rows.append(("spmv (A+B kernels + norm)", spmv, spmv))
    cgs2 = slope_us(build_cgs2)
    rows.append(("+ CGS2 (two-pass, full basis)", cgs2, cgs2 - spmv))
    slv = slope_us(build_solve)
    rows.append(("+ projected Tikhonov solve", slv, slv - cgs2))
    full = slope_us(build_full)
    rows.append(("full ba_gmres fused (prod)", full, full - slv))
    defer = slope_us(lambda mx: build_full(mx, defer_histories=True))
    rows.append(("full, defer_histories=True", defer, defer - full))
    try:
        bf16q = slope_us(lambda mx: build_full(mx, basis_dtype=jnp.bfloat16))
        rows.append(("full, bf16 basis", bf16q, bf16q - full))
    except TypeError:
        print("basis_dtype not supported by ba_gmres (lever not built)",
              file=sys.stderr)

    print("NOTE: slope noise through the tunnel is ~+-10 us/iter; the "
          "sub-20 us deltas (CGS2/solve) need a quiet tunnel window — "
          "cross-check the raw mins on stderr", file=sys.stderr)
    print(f"{'variant':36s} {'us/iter':>9s} {'delta':>9s}")
    for name, v, d in rows:
        print(f"{name:36s} {v:9.1f} {d:+9.1f}")


if __name__ == "__main__":
    main()
