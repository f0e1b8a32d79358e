"""2-D CT phantom reconstruction ON THE TPU TIER (VERDICT r3 #9).

The flagship reference driver (``run_2D_phantom.m:5-9`` scenario, scaled to
the bench geometry) executed end-to-end on the hardware the framework is
named for: n=64 Shepp-Logan, 180x180 fan-beam, mismatched (A, B), 25%
noise — int8 Morton-ordered Pallas operators, fused exact residual, hybrid
BA-GMRES (the production path ``bench.py`` measures), plus the serving
surfaces: an R-frame batched solve and a warm-started successive frame.

The reconstruction quality is ASSERTED against the stored exact-f32
reference for this scenario (min-over-k rel-err 0.4328 +-3%, the bench.py
quality gate): a fast-path regression fails the experiment, not just the
benchmark.

On a CPU backend (no chip) the driver degrades to a small dense-f32
configuration so the module stays importable/testable everywhere; the
quality gate then only checks finiteness + a loose band (the stored
reference is specific to the TPU-scale scenario).

    python -m hybrid_gmres_tpu.experiments phantom2d_tpu --device
"""

from __future__ import annotations

import time
import dataclasses
from dataclasses import dataclass, field
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from hybrid_gmres_tpu.experiments.common import get_pyplot, save_figure
from hybrid_gmres_tpu.problems.ct import ct_mismatched
from hybrid_gmres_tpu.solvers.batched import ba_gmres_batched
from hybrid_gmres_tpu.solvers.gmres import ba_gmres

# bench.py's stored exact-f32 reference for this exact scenario
MIN_ERR_F32_REFERENCE = 0.4328
MIN_ERR_TOLERANCE = 1.03


@dataclass
class Config:
    n: int = 64                  # run_2D_phantom.m:5 (bench geometry)
    n_angles: int = 180
    n_det: int = 180
    noise_level: float = 0.25    # :6
    maxit: int = 100
    lam: float = 1e-2            # :8
    dtype: str = "int8"          # production panel dtype (DESIGN §11)
    R: int = 4                   # serving frames in the batched solve
    seed: int = 0


@dataclass
class Results:
    cfg: Config
    backend: str
    min_err: float               # min-over-k rel error, single solve
    final_err: float
    niters: int
    it_per_s: float              # wall iterations/s of the timed solve
    batched_min_err_worst: float  # worst per-frame min-err, R frames
    warm_iters_to_gate: int      # successive frame, warm-started
    cold_iters_to_gate: int
    gate: float
    err_hist: np.ndarray = field(repr=False, default=None)
    batched_err_hists: np.ndarray = field(repr=False, default=None)
    recon: np.ndarray = field(repr=False, default=None)   # (n, n) image
    sino: np.ndarray = field(repr=False, default=None)


def _noise(b_exact, level, seed):
    rng = np.random.default_rng(seed)
    e = rng.standard_normal(b_exact.shape)
    e = e / np.linalg.norm(e) * level * float(np.linalg.norm(b_exact))
    return (np.asarray(b_exact) + e).astype(np.float32)


def run(cfg: Config | None = None) -> Results:
    caller_cfg = cfg is not None
    cfg = cfg or Config()
    on_tpu = jax.default_backend() not in ("cpu",)
    if not on_tpu:
        # Off-chip the operators are dense f32 (no Mosaic; interpret mode
        # at n=64 would crawl).  Only the DEFAULT configuration is shrunk
        # to keep the CPU suite fast — an explicit caller Config is
        # honored as given.
        if not caller_cfg:
            cfg = Config(n=32, n_angles=90, n_det=90, maxit=40, R=2)
        cfg = dataclasses.replace(cfg, dtype="dense-f32")

    prob = ct_mismatched(n=cfg.n, n_angles=cfg.n_angles, n_det=cfg.n_det,
                         dense=not on_tpu)
    if on_tpu:
        from hybrid_gmres_tpu.ops.ordering import inverse_perm
        from hybrid_gmres_tpu.problems.ct import ct_tpu_operators

        A_op, B_op, _, x_true_p, ray_perm, pix_perm = ct_tpu_operators(
            prob, dtype=(jnp.int8 if cfg.dtype == "int8" else cfg.dtype),
            n_buckets=8)
        rp = np.asarray(ray_perm)
        unpix = np.asarray(inverse_perm(pix_perm))
        xt = jnp.asarray(x_true_p, dtype=jnp.float32)
    else:
        A_op, B_op = prob.A, prob.B
        rp = np.arange(prob.b_exact.shape[0])
        unpix = np.arange(prob.x_true.shape[0])
        xt = jnp.asarray(prob.x_true, dtype=jnp.float32)

    b_noisy = _noise(prob.b_exact, cfg.noise_level, cfg.seed)
    b = jnp.asarray(b_noisy[rp])

    @jax.jit
    def _solve(A, B, bb, x):
        return ba_gmres(A, B, bb, x, tol=0.0, maxit=cfg.maxit, lam=cfg.lam,
                        residual="fused")

    r = _solve(A_op, B_op, b, xt)
    jax.block_until_ready(r.x)
    float(jnp.sum(r.x))  # forced host readback (axon timing gotcha)
    times = []
    for _ in range(3):
        t0 = time.time()
        r = _solve(A_op, B_op, b, xt)
        jax.block_until_ready(r.x)
        times.append(time.time() - t0)
    float(jnp.sum(r.x))
    it_per_s = cfg.maxit / min(times)

    err_hist = np.asarray(r.err_hist)
    min_err = float(np.nanmin(err_hist))
    niters = int(r.niters)
    final_err = float(err_hist[niters - 1])
    recon = np.asarray(r.x)[unpix].reshape(cfg.n, cfg.n)

    # serving surfaces: R frames batched (fresh noise per frame), then a
    # successive frame warm-started from the gate-stopped first solve
    gate = MIN_ERR_F32_REFERENCE * MIN_ERR_TOLERANCE
    cols = [_noise(prob.b_exact, cfg.noise_level, cfg.seed + 1 + i)[rp]
            for i in range(cfg.R)]
    b_batch = jnp.asarray(np.stack(cols, axis=1))

    @jax.jit
    def _batched(A, B, bb, x, x0):
        # ONE compiled program serves cold (zero x0) and warm: for this
        # run-once driver the dead b - A@0 SpMM is microseconds while a
        # second maxit=100 compile would double the wall time (measured
        # 49 -> 96 s).  defer_histories = the serving mode (DESIGN §13).
        return ba_gmres_batched(A, B, bb, x, tol=0.0, maxit=cfg.maxit,
                                lam=cfg.lam, x0=x0, defer_histories=True)

    rb = _batched(A_op, B_op, b_batch, xt,
                  jnp.zeros((xt.shape[0], cfg.R), jnp.float32))
    jax.block_until_ready(rb.x)
    batched_err = np.asarray(rb.err_hist)
    batched_worst = float(np.nanmax(np.nanmin(batched_err, axis=0)))

    def iters_to_gate(e, g):
        hit = e <= g
        return int(np.argmax(hit) + 1) if hit.any() else -1

    cold_k = iters_to_gate(batched_err[:, 0], gate)
    # serving flow: the PREVIOUS frame (b, seed 0) stops at ITS OWN gate
    # crossing (semi-convergent solvers must not run past it — the final
    # maxit iterate is the over-fitted one); its solution seeds the next
    # frames.  On the TPU scenario the gate is asserted reachable below;
    # the CPU fallback clamps to 1 if its smaller problem never crosses.
    k_prev = iters_to_gate(err_hist, gate)
    k_stop = max(k_prev, 1)

    @jax.jit
    def _stop_solve(A, B, bb, x):
        return ba_gmres(A, B, bb, x, tol=0.0, maxit=k_stop, lam=cfg.lam,
                        residual="fused")

    r_stop = _stop_solve(A_op, B_op, b, xt)
    jax.block_until_ready(r_stop.x)
    warm_prev = jnp.broadcast_to(r_stop.x[:, None], (xt.shape[0], cfg.R))
    rw = _batched(A_op, B_op, b_batch, xt, warm_prev)
    jax.block_until_ready(rw.x)
    warm_k = iters_to_gate(np.asarray(rw.err_hist)[:, 0], gate)

    if on_tpu:
        # quality gate — explicit raise (a bare assert vanishes under -O,
        # and this is the experiment's stated contract)
        if not (np.isfinite(min_err) and min_err <= gate):
            raise RuntimeError(
                f"TPU phantom quality gate failed: {min_err:.4f} > "
                f"{gate:.4f}")
        if batched_worst > gate:
            raise RuntimeError(
                f"batched frame quality gate failed: {batched_worst:.4f}")
    elif not np.isfinite(min_err):
        raise RuntimeError("CPU fallback produced a non-finite error")

    return Results(
        cfg=cfg, backend=jax.default_backend(), min_err=min_err,
        final_err=final_err, niters=niters, it_per_s=float(it_per_s),
        batched_min_err_worst=batched_worst, warm_iters_to_gate=warm_k,
        cold_iters_to_gate=cold_k, gate=float(gate), err_hist=err_hist,
        batched_err_hists=batched_err, recon=recon,
        sino=b_noisy.reshape(cfg.n_angles, cfg.n_det),
    )


def figures(res: Results, outdir: str):
    plt = get_pyplot()
    cfg = res.cfg
    paths = []

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4.5))
    im = ax1.imshow(res.sino.T, cmap="gray", aspect="auto", origin="lower")
    ax1.set_title(f"Noisy Sinogram ({cfg.noise_level*100:.0f}% noise)")
    ax1.set_xlabel("Projection Index (k)")
    ax1.set_ylabel("Detector Element")
    fig.colorbar(im, ax=ax1)
    ax2.imshow(res.recon, cmap="gray")
    ax2.set_title(f"Hybrid BA-GMRES on {res.backend} "
                  f"({cfg.dtype} panels, min err {res.min_err:.3f})")
    ax2.axis("off")
    fig.suptitle(f"TPU-tier CT reconstruction (n={cfg.n}, "
                 f"{cfg.n_angles}x{cfg.n_det})")
    paths.append(save_figure(fig, outdir, "phantom_tpu_reconstruction.png"))

    fig, ax = plt.subplots(figsize=(8, 5))
    ax.semilogy(np.arange(1, len(res.err_hist) + 1), res.err_hist, "-",
                lw=2, label="single solve")
    for i in range(res.batched_err_hists.shape[1]):
        ax.semilogy(np.arange(1, res.batched_err_hists.shape[0] + 1),
                    res.batched_err_hists[:, i], ":", lw=1,
                    label=f"batched frame {i}" if i < 2 else None)
    ax.axhline(res.gate, color="k", ls="--", lw=1,
               label=f"quality gate {res.gate:.3f}")
    ax.set_title(f"Semi-convergence on {res.backend} "
                 f"({res.it_per_s:.0f} it/s wall)")
    ax.set_xlabel("Iteration (k)")
    ax.set_ylabel("Relative Error")
    ax.grid(True)
    ax.legend(loc="best")
    paths.append(save_figure(fig, outdir, "phantom_tpu_semiconvergence.png"))
    return paths


def main(outdir: str = "figures"):
    res = run()
    return res, figures(res, outdir)
