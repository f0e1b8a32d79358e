"""Reproducible SpMV kernel microbenchmark (the source of the DESIGN.md §4/§10
numbers).

Builds the CT n=64 operator pair, packages it at several panel dtypes
(f32 / bf16 / int8 / packed int4), and reports per-matvec wall time and
effective panel bandwidth for the forward kernel of each, plus the dense
XLA matvec baseline.  Run on the TPU:

    python scripts/kernel_microbench.py [--n 64] [--angles 180] [--iters 30]

Timing methodology (CLAUDE.md): the matvec is chained inside ONE jit so XLA
cannot hoist the body, and a host readback forces completion.  The ~20 ms
per-call tunnel dispatch would swamp a single-count measurement, so each
dtype is timed at TWO chain lengths and the per-matvec cost is the slope
``(t_hi - t_lo) / (iters_hi - iters_lo)`` — the same maxit-scaling method
as the DESIGN.md §10 wall decomposition.
"""

import argparse
import sys
import time

import numpy as np


def chained_apply(iters):
    """jitted (op, x) -> x after ``iters`` chained matvecs.  The operator is
    an ARGUMENT, not a closure — closed-over panels inline into the axon
    remote-compile payload (HTTP 413; CLAUDE.md)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(op, x):
        def body(_, v):
            y = op.matvec(v)
            # carry depends on y so XLA cannot hoist the loop body; the
            # 1e-9 scalar keeps the input essentially constant
            return v + jnp.float32(1e-9) * jnp.sum(y).astype(v.dtype)

        return jax.lax.fori_loop(0, iters, body, x)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--angles", type=int, default=180)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hybrid_gmres_tpu.problems.ct import ct_mismatched, ct_tpu_operators

    on_tpu = jax.default_backend() not in ("cpu",)
    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    prob = ct_mismatched(n=args.n, n_angles=args.angles, n_det=args.angles,
                         dense=False)
    m, n = prob.A_csr.shape
    nnz = prob.A_csr.nnz
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    rows = []
    for dt, label in [(jnp.float32, "f32"), (jnp.bfloat16, "bf16"),
                      (jnp.int8, "int8"), ("int4", "int4")]:
        A_op, _, _, _, _, _ = ct_tpu_operators(prob, dtype=dt, n_buckets=8)
        if not on_tpu:
            A_op = type(A_op)(A_op.fwd, A_op.adj, interpret=True,
                              fwd_scale=A_op.fwd_scale,
                              adj_scale=A_op.adj_scale)
        def timed(iters):
            run = chained_apply(iters)
            y = run(A_op, x)
            float(jnp.sum(y))  # compile + sync
            times = []
            for _ in range(3):
                t0 = time.time()
                y = run(A_op, x)
                float(jnp.sum(y))  # force readback
                times.append(time.time() - t0)
            return min(times)

        lo, hi = args.iters, 4 * args.iters
        dt_apply = (timed(hi) - timed(lo)) / (hi - lo)
        panel_mb = A_op.fwd.nbytes / 1e6
        gbs = A_op.fwd.nbytes / dt_apply / 1e9
        rows.append((label, panel_mb, dt_apply * 1e6, gbs))
        print(f"{label:5s} panel {panel_mb:7.1f} MB  {dt_apply*1e6:8.1f} us/"
              f"matvec  {gbs:7.1f} GB/s  ({nnz/dt_apply/1e9:.2f} Gnnz/s)")

    # dense XLA baseline
    Ad = jnp.asarray(prob.A_csr.toarray().astype(np.float32))

    from hybrid_gmres_tpu.ops.linear_operator import DenseOperator

    dop = DenseOperator(Ad)

    def timed_dense(iters):
        run = chained_apply(iters)
        y = run(dop, x)
        float(jnp.sum(y))
        t0 = time.time()
        y = run(dop, x)
        float(jnp.sum(y))
        return time.time() - t0

    lo, hi = args.iters, 4 * args.iters
    dt_apply = (timed_dense(hi) - timed_dense(lo)) / (hi - lo)
    print(f"dense panel {Ad.nbytes/1e6:7.1f} MB  {dt_apply*1e6:8.1f} us/"
          f"matvec  {Ad.nbytes/dt_apply/1e9:7.1f} GB/s")


if __name__ == "__main__":
    main()
