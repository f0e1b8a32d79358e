"""GCV-based regularization-parameter selection on the projected problem.

The reference's ``gcv_function.m`` re-runs a fresh k_gcv-step Arnoldi for
*every* objective evaluation inside ``fminbnd`` even though the Arnoldi
factorization is lambda-independent (SURVEY.md §1 L4).  Here the efficient
pattern of ``plot_gcv_surface.m:58-102`` is the only pattern: factor once,
then sweep/minimize lambda on the projected k x k system, vectorized with
``vmap`` — mathematically identical results, ~two orders of magnitude less
work.

GCV objective (``gcv_function.m:35-54``):
    GCV(lam) = || t_k - Hbar y(lam) ||^2 / (N - sum_i s_i^2/(s_i^2+lam))^2
with ``y(lam)`` the Tikhonov-projected solution, ``s_i`` the singular values
of the *square* block ``H_k`` and ``N`` the full problem dimension (m for
'ab', n for 'ba' — the reference's choice, kept for parity; see SURVEY.md
§2.3).  NaN/Inf and tiny denominators map to 1e20 (``gcv_function.m:56-58``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hybrid_gmres_tpu.ops.linear_operator import as_operator
from hybrid_gmres_tpu.krylov.arnoldi import arnoldi
from hybrid_gmres_tpu.krylov.projected import projected_tikhonov_solve


def gcv_from_H(H, t, lam, trace_dim, kdim, weight=1.0, R=None, rhs=None):
    """GCV value from a padded Hessenberg factorization.

    ``H``: (kmax+1, kmax) padded (columns >= kdim zero); ``t``: (kmax+1,)
    padded ``beta e1``; ``trace_dim``: the N in the denominator (full problem
    dimension, reference convention).  Vectorize over ``lam`` with ``vmap``.

    ``weight``: the weighted-GCV parameter omega (Chung/Nagy/O'Leary):
    denominator ``(N - omega * trace)^2``.  The default 1.0 is plain GCV
    (reference parity).

    ``R``/``rhs`` (optional): evaluate the numerator in the ORIGINAL data
    space as ``||rhs - R y(lam)||^2`` with ``R`` the (m, kmax) image of the
    solution basis (BA: ``A Q_k``).  The reference's projected numerator
    ``||t - Hbar y||^2`` (``gcv_function.m:38-40``) vanishes as lam -> 0 for
    BA-GMRES — the n-space Krylov residual forgets the data noise that B
    already smoothed — which drives the minimizer into the lower search
    bound; no wGCV omega can repair a vanishing numerator (measured:
    omega in [0.5, 1.6] all select the 1e-9 floor on shaw).  For AB the two
    numerators are identical by the Arnoldi relation
    ``A B Q_k = Q_{k+1} Hbar_k`` (r0 = b), so this only changes BA.
    """
    kmax = H.shape[1]
    dtype = H.dtype
    lam = jnp.asarray(lam, dtype=dtype)
    col = jnp.arange(kmax)
    H = jnp.where(col[None, :] < kdim, H, jnp.zeros((), dtype))
    y = projected_tikhonov_solve(H, t, lam, kdim)
    if R is None:
        resid = t - H @ y
    else:
        resid = rhs - R @ y
    residual_norm_sq = jnp.sum(resid * resid)

    # Singular values of the square block H_k: svd of the padded square part
    # H[:kmax, :kmax] whose inactive rows/cols are zero -> extra zero singular
    # values, which contribute 0/(0+lam) = 0 to the trace term, so no masking
    # is needed (matches svd(H(1:k,1:k)) at gcv_function.m:42).
    s = jnp.linalg.svd(H[:kmax, :kmax], compute_uv=False)
    trace_val = jnp.sum(s**2 / (s**2 + lam))
    w = jnp.asarray(weight, dtype)
    denominator = (jnp.asarray(trace_dim, dtype) - w * trace_val) ** 2

    gcv = residual_norm_sq / denominator
    bad = (
        jnp.isnan(gcv)
        | jnp.isinf(gcv)
        | (denominator < jnp.finfo(dtype).eps)
    )
    return jnp.where(bad, jnp.asarray(1e20, dtype), gcv)


def gcv_factors(H, t, kdim):
    """Precompute the lambda-INDEPENDENT factors of the GCV objective.

    One economy SVD of the padded ``Hbar`` (solve/numerator) plus one of the
    square block ``H_k`` (trace) replace a full SVD per grid point: with the
    spectral identities ``y(lam) = V diag(s/(s^2+lam)) U^T t`` and
    ``||t - Hbar y||^2 = sum_i (lam/(s_i^2+lam))^2 (u_i^T t)^2 + ||t_perp||^2``
    the per-lambda evaluation is O(k) elementwise — the adaptive per-
    iteration selector (``lam="gcv"`` in the solvers) was 50 SVDs of the
    padded (maxit+1, maxit) H per iteration without this (VERDICT r1 weak#7).
    Padded columns contribute zero singular values, which fall out of every
    term exactly as in :func:`gcv_from_H`.
    """
    kmax = H.shape[1]
    dtype = H.dtype
    col = jnp.arange(kmax)
    H = jnp.where(col[None, :] < kdim, H, jnp.zeros((), dtype))
    Ub, sb, _ = jnp.linalg.svd(H, full_matrices=False)
    g = Ub.T @ t                                   # (kmax,)
    t_perp_sq = jnp.maximum(jnp.sum(t * t) - jnp.sum(g * g),
                            jnp.zeros((), dtype))
    s_tr = jnp.linalg.svd(H[:kmax, :kmax], compute_uv=False)
    return sb, g, t_perp_sq, s_tr


def gcv_from_factors(factors, lam, trace_dim, weight=1.0):
    """GCV(lam) from :func:`gcv_factors` — O(k), safe to vmap over lam."""
    sb, g, t_perp_sq, s_tr = factors
    dtype = g.dtype
    lam = jnp.asarray(lam, dtype=dtype)
    shrink = lam / (sb**2 + lam)
    residual_norm_sq = jnp.sum(shrink**2 * g * g) + t_perp_sq
    trace_val = jnp.sum(s_tr**2 / (s_tr**2 + lam))
    w = jnp.asarray(weight, dtype)
    denominator = (jnp.asarray(trace_dim, dtype) - w * trace_val) ** 2
    gcv = residual_norm_sq / denominator
    bad = (
        jnp.isnan(gcv)
        | jnp.isinf(gcv)
        | (denominator < jnp.finfo(dtype).eps)
    )
    return jnp.where(bad, jnp.asarray(1e20, dtype), gcv)


def _arnoldi_for(gcv_type, A, B, b, k_gcv, breakdown_tol=1e-12):
    """One Arnoldi factorization for GCV ('ab': M = A B on b; 'ba': M = B A on B b).

    Mirrors ``gcv_function.m:4-32`` including the 1e-12 breakdown tolerance.
    """
    A = as_operator(A)
    B = as_operator(B)
    if gcv_type == "ab":
        mv = lambda q: A.matvec(B.matvec(q))
        r0 = b
        trace_dim = A.shape[0]
    elif gcv_type == "ba":
        mv = lambda q: B.matvec(A.matvec(q))
        r0 = B.matvec(b)
        trace_dim = A.shape[1]
    else:
        raise ValueError("gcv_type must be 'ab' or 'ba'")
    Q, H, beta, nsteps = arnoldi(mv, r0, int(k_gcv), breakdown_tol=breakdown_tol)
    t = jnp.zeros((int(k_gcv) + 1,), dtype=H.dtype).at[0].set(beta)
    return H, t, trace_dim, nsteps, Q


def _original_space_R(gcv_type, A, B, b, Q, H):
    """(R, rhs) for the original-space GCV numerator ``||b - R y||``.

    BA: the iterate is ``x = Q_k y`` so the data-space image is
    ``R = A Q_k`` (k extra matvecs, factor-once like the Arnoldi).
    AB: ``x = B Q_k y`` and ``A B Q_k = Q_{k+1} Hbar_k``, so ``R = Q Hbar``
    costs no matvecs (and equals the projected numerator exactly).
    """
    A = as_operator(A)
    kmax = H.shape[1]
    if gcv_type == "ab":
        return Q @ H, b
    R = jax.vmap(A.matvec, in_axes=1, out_axes=1)(Q[:, :kmax])
    return R, b


def gcv_curve(gcv_type, A, B, b, k_gcv, lam_grid, weight=1.0,
              residual_space="projected"):
    """GCV(lam) over a grid at fixed Krylov dimension k_gcv (factor once + vmap).

    Note: like ``gcv_function.m:33`` the projected dimension stays k_gcv even
    if Arnoldi broke down early (the trailing columns are zero).

    ``residual_space``: "projected" (reference parity, ``gcv_function.m:38``)
    or "original" (data-space numerator; fixes the BA floor-hitting bias —
    see :func:`gcv_from_H`).
    """
    H, t, trace_dim, _, Q = _arnoldi_for(gcv_type, A, B, b, k_gcv)
    R, rhs = _maybe_original(residual_space, gcv_type, A, B, b, Q, H)
    kdim = jnp.int32(k_gcv)
    f = jax.vmap(lambda lam: gcv_from_H(H, t, lam, trace_dim, kdim, weight,
                                        R, rhs))
    return f(jnp.asarray(lam_grid, dtype=H.dtype))


def _maybe_original(residual_space, gcv_type, A, B, b, Q, H):
    if residual_space == "projected":
        return None, None
    if residual_space != "original":
        raise ValueError("residual_space must be 'projected' or 'original'")
    return _original_space_R(gcv_type, A, B, b, Q, H)


def gcv_surface(gcv_type, A, B, b, k_range, lam_grid):
    """GCV(k, lam) surface + per-k argmin-lambda path.

    The ``plot_gcv_surface.m:58-102`` pattern: ONE incremental Arnoldi to
    max(k_range), then for each k the lambda grid is evaluated on the
    projected system — here as a single vmap over (k, lam) pairs.
    Returns ``(surface, path)`` with surface shape (len(lam_grid), len(k_range)).
    """
    kmax = int(max(k_range))
    H, t, trace_dim, nsteps, _ = _arnoldi_for(gcv_type, A, B, b, kmax)
    lam_grid = jnp.asarray(lam_grid, dtype=H.dtype)
    ks = jnp.asarray(list(k_range), dtype=jnp.int32)

    def per_k(kdim):
        # zero out H columns >= kdim so the padded solve sees the k-step system
        col = jnp.arange(kmax)
        Hk = jnp.where(col[None, :] < kdim, H, 0.0)
        return jax.vmap(lambda lam: gcv_from_H(Hk, t, lam, trace_dim, kdim))(lam_grid)

    surface = jax.vmap(per_k, out_axes=1)(ks)  # (n_lam, n_k)
    path = lam_grid[jnp.argmin(surface, axis=0)]
    return surface, path


def minimize_scalar_bounded(f, lo, hi, tol=1e-8, maxiter=200):
    """Golden-section + parabolic bounded scalar minimization (fminbnd parity).

    A host-side Brent-style minimizer matching MATLAB ``fminbnd``'s role at
    ``analyze_regularization.m:37-46`` (optimset TolX=1e-8).  ``f`` may be a
    jitted JAX function; evaluation happens eagerly on host.
    """
    import math

    golden = 0.5 * (3.0 - math.sqrt(5.0))
    a, b = float(lo), float(hi)
    x = w = v = a + golden * (b - a)
    fx = fw = fv = float(f(x))
    d = e = 0.0
    for _ in range(int(maxiter)):
        m = 0.5 * (a + b)
        tol1 = tol * abs(x) + 1e-25
        tol2 = 2.0 * tol1
        if abs(x - m) <= tol2 - 0.5 * (b - a):
            break
        use_golden = True
        if abs(e) > tol1:
            # parabolic fit through (v, fv), (w, fw), (x, fx)
            r = (x - w) * (fx - fv)
            q = (x - v) * (fx - fw)
            p = (x - v) * q - (x - w) * r
            q = 2.0 * (q - r)
            if q > 0.0:
                p = -p
            q = abs(q)
            etemp = e
            e = d
            if abs(p) < abs(0.5 * q * etemp) and p > q * (a - x) and p < q * (b - x):
                d = p / q
                u = x + d
                if (u - a) < tol2 or (b - u) < tol2:
                    d = tol1 if x < m else -tol1
                use_golden = False
        if use_golden:
            e = (b - x) if x < m else (a - x)
            d = golden * e
        u = x + d if abs(d) >= tol1 else x + (tol1 if d > 0 else -tol1)
        fu = float(f(u))
        if fu <= fx:
            if u < x:
                b = x
            else:
                a = x
            v, fv, w, fw, x, fx = w, fw, x, fx, u, fu
        else:
            if u < x:
                a = u
            else:
                b = u
            if fu <= fw or w == x:
                v, fv, w, fw = w, fw, u, fu
            elif fu <= fv or v == x or v == w:
                v, fv = u, fu
    return x, fx


def gcv_lambda(
    gcv_type,
    A,
    B,
    b,
    k_gcv: int = 20,
    lo: float = 1e-9,
    hi: float = 1e-1,
    tol: float = 1e-8,
    weight: float = 1.0,
    residual_space: str = "projected",
):
    """GCV-optimal lambda via bounded minimization on the projected problem.

    Equivalent to the reference's ``fminbnd(gcv_function(...), 1e-9, 1e-1)``
    (``analyze_regularization.m:39-46``) but factors the Arnoldi once.

    ``residual_space="original"`` evaluates the numerator against the
    original data (recommended for 'ba', whose projected numerator vanishes
    as lam -> 0 and parks the minimizer at ``lo`` — see :func:`gcv_from_H`).
    """
    H, t, trace_dim, _, Q = _arnoldi_for(gcv_type, A, B, b, k_gcv)
    R, rhs = _maybe_original(residual_space, gcv_type, A, B, b, Q, H)
    kdim = jnp.int32(k_gcv)
    g = jax.jit(lambda lam: gcv_from_H(H, t, lam, trace_dim, kdim, weight,
                                       R, rhs))
    lam_opt, gcv_val = minimize_scalar_bounded(g, lo, hi, tol=tol)
    return lam_opt, gcv_val
