"""Krylov-state checkpoint / resume.

The reference recomputes everything from scratch (no save/load anywhere —
SURVEY.md §5).  Here a solver result (which carries the full padded Krylov
factorization Q, H) can be saved and a GMRES solve *continued* from it with
a larger iteration budget: the Arnoldi recurrence restarts exactly where it
stopped, so ``resume(save(run(maxit=k)), maxit=K)`` equals ``run(maxit=K)``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from hybrid_gmres_tpu.solvers.common import GMRESResult


def save_state(path: str, result: GMRESResult) -> None:
    d = dict(
        x=np.asarray(result.x),
        err_hist=np.asarray(result.err_hist),
        res_hist=np.asarray(result.res_hist),
        # scalar for single-RHS runs, (R,) for batched results
        niters=np.asarray(result.niters, dtype=np.int32),
        Q=np.asarray(result.Q),
        H=np.asarray(result.H),
        beta=np.asarray(result.beta),
    )
    # fused-residual image bases (present on residual="fused" runs; saving
    # them is what makes the production fused mode resumable)
    if result.IMG is not None:
        d["IMG"] = np.asarray(result.IMG)
    if result.S is not None:
        d["S"] = np.asarray(result.S)
    if result.active is not None:
        d["active"] = np.asarray(result.active)
    if getattr(result, "fp", None) is not None:
        d["fp"] = np.asarray(result.fp)
    np.savez_compressed(path, **d)


def load_state(path: str) -> GMRESResult:
    """Load a saved solver state.

    Legacy checkpoints (saved before the ``active`` flag existed) resume
    through a heuristic: ``active = (niters == len(res_hist))``, i.e. a run
    that filled its whole budget is assumed still active.  That heuristic
    CANNOT distinguish a run that stopped (tol/breakdown) exactly on its
    final budgeted iteration — such a checkpoint silently resumes ACTIVE
    and records iterations the uninterrupted run would not have.  A
    ``UserWarning`` is emitted for exactly that ambiguous case; re-save
    with the current version (which stores ``active``) to silence it.
    """
    z = np.load(path)
    out = GMRESResult(
        x=jnp.asarray(z["x"]),
        err_hist=jnp.asarray(z["err_hist"]),
        res_hist=jnp.asarray(z["res_hist"]),
        niters=jnp.asarray(z["niters"], dtype=jnp.int32),
        Q=jnp.asarray(z["Q"]),
        H=jnp.asarray(z["H"]),
        beta=jnp.asarray(z["beta"]),
        IMG=jnp.asarray(z["IMG"]) if "IMG" in z.files else None,
        S=jnp.asarray(z["S"]) if "S" in z.files else None,
        active=(jnp.asarray(z["active"]) if "active" in z.files else None),
        fp=jnp.asarray(z["fp"]) if "fp" in z.files else None,
    )
    ni = np.asarray(z["niters"])
    if "active" not in z.files and ni.ndim == 0 and \
            int(ni) == len(z["res_hist"]):
        import warnings

        warnings.warn(
            "legacy checkpoint without an 'active' flag whose niters equals "
            "its budget: resume will assume the run was still ACTIVE, which "
            "is wrong if it stopped (tol/breakdown) exactly on its final "
            "iteration — re-save with the current version to disambiguate",
            UserWarning, stacklevel=2)
    return out


def resume_fingerprint(x0, lam, tag: str = ""):
    """Compact (3,) fingerprint of a solve's ``(x0, lam, tag)`` triple.

    ``niters``-invariant by construction: entry 0 is a fixed-weight
    checksum of ``x0`` (cosine weights — permutation-sensitive, unlike a
    plain sum), entry 1 encodes ``lam`` EXACTLY (scalar value; None → -1,
    "gcv" → -2, "gcv-final" → -3), entry 2 encodes ``tag``.  Stored in
    checkpointed results so a resume with a DIFFERENT ``x0``/``lam`` —
    which would silently produce wrong numbers (the Krylov factorization
    is x0/lam-specific) — raises instead (:func:`check_fingerprint`).
    Traceable (a traced ``x0`` or ``lam`` yields a traced fingerprint;
    the check then degrades to a no-op, documented there).

    ``tag``: extra mode string in its OWN slot for solvers whose math
    depends on a non-numeric flag (e.g. ``hybrid_lsmr``'s
    ``x0_reg="full"`` — a resume under the other semantics must raise,
    not silently mix regularizers).  Keeping it separate preserves full
    float32 resolution on the lam slot (an additive tag offset would
    swamp lam's mantissa and let any lam pass the check)."""
    codes = {"gcv": -2.0, "gcv-final": -3.0}
    if isinstance(lam, str):
        lam_val = jnp.float32(codes.get(lam, -9.0))
    elif lam is None:
        lam_val = jnp.float32(-1.0)
    else:
        lam_arr = jnp.asarray(lam, jnp.float32).reshape(-1)
        if lam_arr.shape[0] == 1:
            lam_val = lam_arr[0]
        else:
            # per-RHS lam vector (batched hybrids): deterministic
            # fixed-weight checksum — still an exact encoding of the
            # concrete vector, compared exactly
            wl = jnp.cos(jnp.arange(lam_arr.shape[0],
                                    dtype=jnp.float32) * 1.234) + 0.5
            lam_val = jnp.dot(lam_arr, wl)
    tag_val = jnp.float32(sum((i + 1) * ord(c) for i, c in enumerate(tag)))
    if x0 is None:
        xs = jnp.float32(0.0)
    else:
        x = jnp.ravel(jnp.asarray(x0)).astype(jnp.float32)
        w = jnp.cos(jnp.arange(x.shape[0], dtype=jnp.float32) * 0.7368) + 0.5
        xs = jnp.dot(x, w)
    return jnp.stack([xs, lam_val, tag_val])


def check_fingerprint(resume_from, x0, lam, tag: str = "") -> None:
    """Verify a resume's ``(x0, lam)`` against the checkpointed
    fingerprint.  No-ops when the checkpoint predates fingerprints
    (``fp is None``) or when either side is a tracer (a fully-jitted
    resume cannot be checked host-side — the stored fp still travels with
    the result for later concrete checks)."""
    stored = getattr(resume_from, "fp", None)
    if stored is None:
        return
    import jax

    expected = resume_fingerprint(x0, lam, tag=tag)
    if isinstance(stored, jax.core.Tracer) or \
            isinstance(expected, jax.core.Tracer):
        return
    s, e = np.asarray(stored), np.asarray(expected)
    if s.size == 2:
        # legacy (2,) fingerprint (lam slot carried an additive tag
        # offset): untagged checkpoints check cleanly with tag slot 0;
        # tagged ones fail the exact lam compare below — conservative
        s = np.append(s, 0.0)
    # x0 slot is a lossy float checksum — tolerance; lam and tag slots
    # are exact encodings of the argument, so any difference means a
    # genuinely different solve (a 1e-8 vs 9e-7 lam is a 90x different
    # regularizer, not noise)
    x0_ok = np.allclose(s[0], e[0], rtol=1e-5, atol=1e-6, equal_nan=True)
    if not (x0_ok and s[1] == e[1] and s[2] == e[2]):
        raise ValueError(
            f"resume fingerprint mismatch: checkpoint was created with "
            f"(x0, lam, tag) fingerprint {s.tolist()}, resume passed "
            f"{e.tolist()} — resuming with a different x0/lam silently "
            "corrupts the continuation; pass the ORIGINAL x0/lam (to "
            "change them, start a fresh solve warm-started from .x)")


def check_resumable(resume_from: GMRESResult) -> None:
    """Reject restarted aggregates: their ``niters`` counts ALL cycles but
    ``Q``/``H`` hold only the last cycle's factorization, so resuming from
    one would silently produce a wrong continuation (ADVICE r3)."""
    k0 = int(resume_from.niters)
    if k0 > resume_from.H.shape[1]:
        raise ValueError(
            f"resume_from.niters={k0} exceeds its checkpointed budget "
            f"{resume_from.H.shape[1]} — this is a restarted result, which "
            "holds only the last cycle's factorization and is not "
            "resumable; warm-start a new solve from its .x instead")


def pad_state(result: GMRESResult, maxit: int) -> GMRESResult:
    """Grow the padded factorization to a larger iteration budget."""
    old = result.H.shape[1]
    if maxit < old:
        raise ValueError(f"cannot shrink state: maxit={maxit} < {old}")
    if maxit == old:
        return result
    extra = maxit - old
    dt = result.Q.dtype
    Q = jnp.pad(result.Q, ((0, 0), (0, extra)))
    H = jnp.pad(result.H, ((0, extra), (0, extra)))
    nan = jnp.full((extra,), jnp.nan, dtype=dt)
    pad_cols = lambda M: (None if M is None
                          else jnp.pad(M, ((0, 0), (0, extra))))
    return GMRESResult(
        x=result.x,
        err_hist=jnp.concatenate([result.err_hist, nan]),
        res_hist=jnp.concatenate([result.res_hist, nan]),
        niters=result.niters,
        Q=Q,
        H=H,
        beta=result.beta,
        IMG=pad_cols(result.IMG),
        S=pad_cols(result.S),
        active=result.active,
        fp=getattr(result, "fp", None),
    )


def save_gkb_state(path: str, state) -> None:
    """Serialize a :class:`~hybrid_gmres_tpu.solvers.common.GKBState`
    (LSQR/LSMR resume checkpoint).  The carry tuple is stored positionally;
    absent entries (e.g. the reorth bases when reorth=False) are skipped."""
    d = {
        "res_hist": np.asarray(state.res_hist),
        "err_hist": np.asarray(state.err_hist),
        "carry_len": np.int64(len(state.carry)),
    }
    if state.ar_hist is not None:
        d["ar_hist"] = np.asarray(state.ar_hist)
    if getattr(state, "fp", None) is not None:
        d["fp"] = np.asarray(state.fp)
    for i, c in enumerate(state.carry):
        if c is not None:
            d[f"carry_{i}"] = np.asarray(c)
    np.savez_compressed(path, **d)


def load_gkb_state(path: str):
    from hybrid_gmres_tpu.solvers.common import GKBState

    z = np.load(path)
    n = int(z["carry_len"])
    carry = tuple(
        jnp.asarray(z[f"carry_{i}"]) if f"carry_{i}" in z.files else None
        for i in range(n)
    )
    return GKBState(
        carry=carry,
        res_hist=jnp.asarray(z["res_hist"]),
        err_hist=jnp.asarray(z["err_hist"]),
        ar_hist=jnp.asarray(z["ar_hist"]) if "ar_hist" in z.files else None,
        fp=jnp.asarray(z["fp"]) if "fp" in z.files else None,
    )
