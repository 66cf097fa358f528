"""Vectorized exact LTS (least trimmed squares) slowness estimation.

The reference's robust mode runs FAST-LTS (Rousseeuw & Van Driessen) per
window inside a Python loop: random elemental subsets + concentration
C-steps over the n(n-1)/2 delay equations (SURVEY §3.4 / §7.4).  Because the
slowness dimension is 2, elemental subsets are *pairs of equations* — so
instead of random sampling, every C(P,2) candidate is enumerated and solved
as a closed-form 2x2 system, and the C-steps become batched masked
normal-equation refits.  All of (band, window, candidate) runs as one fused
device computation.  Exhaustive enumeration dominates randomized FAST-LTS:
it cannot miss the global optimum's basin.

Retained-set size: ``h = clamp(floor(ALPHA * P), 3, P)`` equations
(matching oracle._lts_solve).  Equations outside the optimal subset are the
"flagged/dropped" pairs recorded in the reference's stdict.
"""

from __future__ import annotations

from itertools import combinations
from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from narrow_band_least_squares_tpu.ops.solve import (
    masked_refit,
    tree_sum_last,
    vel_baz_from_slowness,
)

SIGMA_TAU_DOF_SHIFT = 2


def lts_h(alpha: float, P: int) -> int:
    return max(3, min(int(np.floor(alpha * P)), P))


def precompute_candidates(
    X: np.ndarray, max_candidates: int = 0, seed: int = 0
) -> Dict[str, np.ndarray]:
    """Host-side elemental 2-subset enumeration and 2x2 inverses.

    ``max_candidates = 0`` (the default) enumerates ALL C(P,2) elemental
    2-subsets — exhaustive LTS; callers bound device memory with
    ``candidate_chunk`` instead of dropping candidates.  ``> 0`` subsamples
    to that many with a fixed-seed RNG (deterministic across runs); on the
    P=66/P=120 test geometries the 4096-candidate subsample reproduces the
    full enumeration's flags exactly (tests/test_large_array.py), but full
    is the default so the optimum's basin can never be missed.
    """
    P = X.shape[0]
    cand = np.array(list(combinations(range(P), 2)), dtype=np.int32)
    if max_candidates and len(cand) > max_candidates:
        rng = np.random.default_rng(seed)
        keep = rng.choice(len(cand), size=max_candidates, replace=False)
        keep.sort()
        cand = cand[keep]
    A = X[cand]                       # (Q, 2, 2)
    det = A[:, 0, 0] * A[:, 1, 1] - A[:, 0, 1] * A[:, 1, 0]
    ok = np.abs(det) > 1e-12
    safe = np.where(ok, det, 1.0)
    Ainv = np.empty_like(A)
    Ainv[:, 0, 0] = A[:, 1, 1] / safe
    Ainv[:, 0, 1] = -A[:, 0, 1] / safe
    Ainv[:, 1, 0] = -A[:, 1, 0] / safe
    Ainv[:, 1, 1] = A[:, 0, 0] / safe
    return {"cand": cand, "Ainv": Ainv, "ok": ok}


def _rank_along_last(x: jnp.ndarray) -> jnp.ndarray:
    """Stable rank of each element along the last axis (0 = smallest).

    Computed as pairwise comparison counts — O(P^2) elementwise ops that
    fuse into one VPU reduction — instead of two stable argsorts: XLA sort
    on TPU is far slower than elementwise work at the row lengths here
    (P = n(n-1)/2 delay equations, tens to low hundreds).  NaNs rank last
    (treated as +inf); exact ties break by index, matching a stable sort.
    """
    x = jnp.where(jnp.isnan(x), jnp.inf, x)
    xi = x[..., :, None]
    xj = x[..., None, :]
    idx = jnp.arange(x.shape[-1])
    tie = idx[None, :] < idx[:, None]
    cnt = (xj < xi) | ((xj == xi) & tie)
    return jnp.sum(cnt, axis=-1)


def _residuals2(tau: jnp.ndarray, X: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    r = tau[..., None, :] - jnp.einsum("pk,...qk->...qp", X, s)
    return r * r


def _c_steps(tau, X, s, h, n_steps):
    """n concentration steps on a candidate block s (..., Q, 2)."""

    def c_step(_, s):
        r2 = _residuals2(tau, X, s)                   # (..., Q, P)
        # exact stable-rank h-selection via comparison counts (no sort —
        # see _rank_along_last); also removes the tie ambiguity the old
        # sort-threshold select had (ties could admit h+1 equations)
        weight = (_rank_along_last(r2) < h).astype(tau.dtype)
        return masked_refit(tau[..., None, :], X, weight)

    return jax.lax.fori_loop(0, n_steps, c_step, s)


def _trimmed_objective(tau, X, s, h):
    """Sum of the h smallest squared residuals of each candidate fit.

    Fixed-tree reduction: the objective feeds funnel/argmin selection and
    must be bitwise identical across program shapes (see tree_sum_last).
    """
    r2 = _residuals2(tau, X, s)
    rank = _rank_along_last(r2)
    sel = (rank < h).astype(tau.dtype)
    obj = tree_sum_last(sel * r2)                     # (..., Q)
    return jnp.where(jnp.isnan(obj), jnp.inf, obj)


def _candidate_sweep(tau, X, cand, Ainv, cand_ok, h, c_steps, funnel_k=0):
    """Elemental solves + C-steps for one candidate block.

    ``funnel_k > 0`` applies the FAST-LTS funnel: ONE C-step on every
    candidate, then the remaining ``c_steps - 1`` only on the ``funnel_k``
    best (by trimmed objective) — the standard Rousseeuw & Van Driessen
    two-stage schedule, vectorized.  Returns (obj (..., K), s (..., K, 2)).
    """
    tau_pairs = tau[..., cand]                        # (..., Q, 2)
    s = jnp.einsum("qij,...qj->...qi", Ainv, tau_pairs)

    if funnel_k and funnel_k < cand.shape[0] and c_steps > 1:
        s = _c_steps(tau, X, s, h, 1)
        obj = _trimmed_objective(tau, X, s, h)
        obj = jnp.where(cand_ok, obj, jnp.inf)
        _, topi = jax.lax.top_k(-obj, funnel_k)       # (..., K)
        s = jnp.take_along_axis(s, topi[..., None], axis=-2)
        s = _c_steps(tau, X, s, h, c_steps - 1)
        obj = _trimmed_objective(tau, X, s, h)        # survivors all valid
        return obj, s

    s = _c_steps(tau, X, s, h, c_steps)
    obj = _trimmed_objective(tau, X, s, h)
    obj = jnp.where(cand_ok, obj, jnp.inf)
    return obj, s


def lts_solve(
    tau: jnp.ndarray,        # (..., P)
    X: jnp.ndarray,          # (P, 2)
    cand: jnp.ndarray,       # (Q, 2) int32
    Ainv: jnp.ndarray,       # (Q, 2, 2)
    cand_ok: jnp.ndarray,    # (Q,) bool
    h: int,
    c_steps: int = 4,
    candidate_chunk: int = 0,
    funnel_k: int = 0,
) -> Dict[str, jnp.ndarray]:
    """Batched exact-enumeration LTS.

    ``candidate_chunk > 0`` sweeps candidates in blocks via ``lax.map`` so
    peak memory is bounded for large arrays (P ~ 100 -> thousands of
    elemental candidates) at identical results.  ``funnel_k > 0`` runs the
    FAST-LTS funnel schedule inside each sweep (see `_candidate_sweep`).

    Returns vel, baz, sig_tau, vel_uncert, baz_uncert, s, retained
    (..., P bool; True = equation kept).
    """
    P = tau.shape[-1]
    Q = cand.shape[0]
    dof = max(h - SIGMA_TAU_DOF_SHIFT, 1)

    # Isolate the sweep from the surrounding program's fusion context.
    # tau is integer-derived (argmax lag / fs), hence bitwise-identical
    # across program shapes (single-array, merged multi-array, sharded);
    # without the barrier XLA fuses/reassociates the residual reductions
    # differently per program, and a last-ulp objective wiggle at the
    # funnel (or argmin) boundary selects a different candidate — the
    # merged-vs-individual parity break of round 2
    # (tests/test_multiarray.py::test_optimized_options_match_individual).
    tau, X, Ainv = jax.lax.optimization_barrier((tau, X, Ainv))

    if candidate_chunk and candidate_chunk < Q:
        nchunk = -(-Q // candidate_chunk)
        pad = nchunk * candidate_chunk - Q
        cand_p = jnp.pad(cand, ((0, pad), (0, 0)))
        Ainv_p = jnp.pad(Ainv, ((0, pad), (0, 0), (0, 0)))
        ok_p = jnp.pad(cand_ok, (0, pad))             # padded: ok=False
        cand_c = cand_p.reshape(nchunk, candidate_chunk, 2)
        Ainv_c = Ainv_p.reshape(nchunk, candidate_chunk, 2, 2)
        ok_c = ok_p.reshape(nchunk, candidate_chunk)

        def block(args):
            cb, ab, ob = args
            obj_b, s_b = _candidate_sweep(tau, X, cb, ab, ob, h, c_steps,
                                          funnel_k)
            best_b = jnp.argmin(obj_b, axis=-1)       # (...,)
            obj_min = jnp.take_along_axis(
                obj_b, best_b[..., None], axis=-1
            )[..., 0]
            s_min = jnp.take_along_axis(
                s_b, best_b[..., None, None], axis=-2
            )[..., 0, :]
            return obj_min, s_min

        obj_blocks, s_blocks = jax.lax.map(block, (cand_c, Ainv_c, ok_c))
        kbest = jnp.argmin(obj_blocks, axis=0)        # (...,)
        obj_best = jnp.min(obj_blocks, axis=0)
        s_best = jnp.take_along_axis(
            s_blocks, kbest[None, ..., None], axis=0
        )[0]
    else:
        obj, s = _candidate_sweep(tau, X, cand, Ainv, cand_ok, h, c_steps,
                                  funnel_k)
        best = jnp.argmin(obj, axis=-1)               # (...,)
        obj_best = jnp.min(obj, axis=-1)
        s_best = jnp.take_along_axis(
            s, best[..., None, None], axis=-2
        )[..., 0, :]                                  # (..., 2)

    # final subset + refit (idempotent when converged, like the oracle)
    r_best = tau - jnp.einsum("pk,...k->...p", X, s_best)
    rank_b = _rank_along_last(r_best * r_best)
    retained = rank_b < h                             # (..., P) bool
    weight = retained.astype(tau.dtype)
    s_fin = masked_refit(tau, X, weight)

    r_fin = tau - jnp.einsum("pk,...k->...p", X, s_fin)
    sigma2 = jnp.sum(weight * r_fin * r_fin, axis=-1) / dof
    sig_tau = jnp.sqrt(sigma2)

    # per-cell (Xs^T Xs)^-1 for the uncertainty ellipse
    Xw = weight[..., None] * X
    m00 = jnp.sum(Xw[..., 0] * X[..., 0], axis=-1)
    m01 = jnp.sum(Xw[..., 0] * X[..., 1], axis=-1)
    m11 = jnp.sum(Xw[..., 1] * X[..., 1], axis=-1)
    det = m00 * m11 - m01 * m01
    safe = jnp.where(jnp.abs(det) > 1e-12, det, 1.0)
    i00, i01, i11 = m11 / safe, -m01 / safe, m00 / safe

    sx, sy = s_fin[..., 0], s_fin[..., 1]
    smag2 = jnp.maximum(sx * sx + sy * sy, 1e-30)
    smag = jnp.sqrt(smag2)
    gvx, gvy = -sx / (smag2 * smag), -sy / (smag2 * smag)
    var_v = sigma2 * (i00 * gvx * gvx + 2 * i01 * gvx * gvy + i11 * gvy * gvy)
    gtx, gty = -sy / smag2, sx / smag2
    var_t = sigma2 * (i00 * gtx * gtx + 2 * i01 * gtx * gty + i11 * gty * gty)

    vel, baz = vel_baz_from_slowness(s_fin)
    return {
        "vel": vel,
        "baz": baz,
        "sig_tau": sig_tau,
        "vel_uncert": jnp.sqrt(jnp.maximum(var_v, 0.0)),
        "baz_uncert": jnp.degrees(jnp.sqrt(jnp.maximum(var_t, 0.0))),
        "s": s_fin,
        "retained": retained,
        "objective": obj_best,
    }
