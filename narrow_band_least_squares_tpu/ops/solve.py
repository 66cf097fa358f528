"""Batched slowness inversion: closed-form 2-parameter least squares.

The co-array system ``tau = X s`` has only two unknowns, so the per-window
SciPy ``lstsq`` of the reference's solver (SURVEY §3.4) collapses to a single
einsum with a precomputed pseudo-inverse, batched over every (band, window)
cell at once.  sigma_tau (Szuberla & Olson 2004 delay-consistency statistic)
and the 1-sigma velocity/back-azimuth uncertainties come from the same
residuals.  Conventions identical to oracle._ols_solve/_uncertainties.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

import jax.numpy as jnp

SIGMA_TAU_DOF_SHIFT = 2  # matches oracle.ltsva.SIGMA_TAU_DOF_SHIFT


def precompute_lstsq(X: np.ndarray) -> Dict[str, np.ndarray]:
    """Host-side constants for the batched solve: pinv and (X^T X)^-1."""
    XtX = X.T @ X
    XtX_inv = np.linalg.inv(XtX)
    pinv = XtX_inv @ X.T              # (2, P)
    return {"X": X, "pinv": pinv, "XtX_inv": XtX_inv}


def vel_baz_from_slowness(s: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """s: (..., 2) slowness [s/km] -> (trace velocity [km/s], back-azimuth [deg])."""
    sx, sy = s[..., 0], s[..., 1]
    smag = jnp.sqrt(sx * sx + sy * sy)
    vel = jnp.where(smag > 0, 1.0 / jnp.maximum(smag, 1e-30), jnp.nan)
    baz = jnp.degrees(jnp.arctan2(-sx, -sy)) % 360.0
    return vel, baz


def ols_solve(
    tau: jnp.ndarray,        # (..., P)
    X: jnp.ndarray,          # (P, 2)
    pinv: jnp.ndarray,       # (2, P)
    XtX_inv: jnp.ndarray,    # (2, 2)
) -> Dict[str, jnp.ndarray]:
    """Batched OLS.  Returns vel, baz, sig_tau, vel_uncert, baz_uncert, s, resid."""
    P = tau.shape[-1]
    s = jnp.einsum("kp,...p->...k", pinv, tau)
    resid = tau - jnp.einsum("pk,...k->...p", X, s)
    dof = max(P - SIGMA_TAU_DOF_SHIFT, 1)
    sigma2 = jnp.sum(resid * resid, axis=-1) / dof
    sig_tau = jnp.sqrt(sigma2)
    vel, baz = vel_baz_from_slowness(s)
    vel_uncert, baz_uncert = uncertainties(s, sigma2, XtX_inv)
    return {
        "vel": vel, "baz": baz, "sig_tau": sig_tau,
        "vel_uncert": vel_uncert, "baz_uncert": baz_uncert,
        "s": s, "resid": resid,
    }


def uncertainties(
    s: jnp.ndarray,          # (..., 2)
    sigma2: jnp.ndarray,     # (...)
    XtX_inv: jnp.ndarray,    # (2, 2)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """1-sigma vel/baz uncertainties: linearized slowness-ellipse propagation."""
    sx, sy = s[..., 0], s[..., 1]
    smag2 = jnp.maximum(sx * sx + sy * sy, 1e-30)
    smag = jnp.sqrt(smag2)
    # cov = sigma2 * XtX_inv; quadratic forms g^T cov g
    a, b_, c = XtX_inv[0, 0], XtX_inv[0, 1], XtX_inv[1, 1]

    gvx = -sx / (smag2 * smag)
    gvy = -sy / (smag2 * smag)
    var_v = sigma2 * (a * gvx * gvx + 2 * b_ * gvx * gvy + c * gvy * gvy)

    gtx = -sy / smag2
    gty = sx / smag2
    var_t = sigma2 * (a * gtx * gtx + 2 * b_ * gtx * gty + c * gty * gty)

    return jnp.sqrt(jnp.maximum(var_v, 0.0)), jnp.degrees(
        jnp.sqrt(jnp.maximum(var_t, 0.0))
    )


def chi2_ellipse_uncertainties(
    vel: np.ndarray,         # (...) trace velocity [km/s]
    baz: np.ndarray,         # (...) back-azimuth [deg]
    sig_tau: np.ndarray,     # (...) delay-residual RMS [s]
    XtX_inv: np.ndarray,     # (2, 2) or (..., 2, 2) normal-matrix inverse
    conf: float = 0.90,
) -> Tuple[np.ndarray, np.ndarray]:
    """Szuberla & Olson (2004) slowness-plane confidence-ellipse intervals.

    The (1 - conf) confidence region of the slowness estimate is the
    ellipse ``{ds : ds^T C^-1 ds <= 1}`` with
    ``C = chi2_ppf(conf, 2) * sig_tau^2 * (X^T X)^-1`` (two slowness
    parameters; chi2_ppf(q, 2) = -2 ln(1 - q) in closed form).  The
    velocity interval comes from the ellipse's radial extent
    (support-function half-width along s-hat: ``d_r = sqrt(r^T C r)``,
    so v in [1/(|s|+d_r), 1/(|s|-d_r)]), the back-azimuth interval from
    its angular extent seen from the origin (``arcsin(d_t / |s|)`` with
    the tangential half-width).  Reference contract: the vendored
    ``lts_array.ltsva`` returns these CIs (SURVEY §3.4); the pipeline's
    own vel_uncert/baz_uncert are the 1-sigma linearized versions, which
    this function reduces to (times the chi2 scale) for small ellipses.
    Host-side numpy — CIs are an API-boundary product.

    ``XtX_inv`` may be a single (2, 2) matrix (OLS: the full co-array
    geometry) or per-window (..., 2, 2) matrices broadcastable against
    ``vel`` (LTS: the retained-subset normal matrix per window, see
    `subset_normal_inverses` — excluded elements widen the ellipse).
    """
    vel = np.asarray(vel, dtype=np.float64)
    baz = np.asarray(baz, dtype=np.float64)
    sig_tau = np.asarray(sig_tau, dtype=np.float64)
    XtX_inv = np.asarray(XtX_inv, dtype=np.float64)
    k = -2.0 * np.log1p(-float(conf))          # chi2.ppf(conf, 2)
    with np.errstate(divide="ignore", invalid="ignore"):
        smag = np.where(vel > 0, 1.0 / np.maximum(vel, 1e-30), np.inf)
    az = np.radians(baz)
    # s = -|s| (sin az, cos az); u = radial unit vector, t = tangential
    ux, uy = -np.sin(az), -np.cos(az)
    tx, ty = -uy, ux
    a = XtX_inv[..., 0, 0]
    b_ = XtX_inv[..., 0, 1]
    c = XtX_inv[..., 1, 1]
    C_scale = k * sig_tau * sig_tau
    d_r = np.sqrt(
        np.maximum(C_scale * (a * ux * ux + 2 * b_ * ux * uy + c * uy * uy), 0.0)
    )
    d_t = np.sqrt(
        np.maximum(C_scale * (a * tx * tx + 2 * b_ * tx * ty + c * ty * ty), 0.0)
    )
    lo = 1.0 / (smag + d_r)
    hi = np.where(smag > d_r, 1.0 / np.maximum(smag - d_r, 1e-30), np.inf)
    vel_ci = 0.5 * (hi - lo)                   # half-width of the interval
    with np.errstate(invalid="ignore"):
        baz_ci = np.degrees(np.arcsin(np.clip(d_t / smag, 0.0, 1.0)))
    baz_ci = np.where(d_t >= smag, 180.0, baz_ci)  # ellipse encloses origin
    return vel_ci, baz_ci


def subset_normal_inverses(
    X: np.ndarray,           # (P, 2) co-array
    keep: np.ndarray,        # (..., P) bool: rows retained per window
) -> np.ndarray:
    """Per-window ``inv(X_kept^T X_kept)`` for LTS confidence ellipses.

    The vendored ``lts_array`` derives the Szuberla & Olson ellipse from
    the normal matrix of the RETAINED co-array rows, so windows with
    flagged (excluded) elements get the wider ellipse their reduced
    geometry implies; using the full-array inverse there understates the
    CIs.  Degenerate subsets (rank < 2, < 3 rows) fall back to the full-
    geometry inverse.  Host-side numpy, vectorized over windows.
    """
    X = np.asarray(X, dtype=np.float64)
    keep = np.asarray(keep, dtype=bool)
    w = keep.astype(np.float64)                          # (..., P)
    m00 = np.einsum("...p,p->...", w, X[:, 0] * X[:, 0])
    m01 = np.einsum("...p,p->...", w, X[:, 0] * X[:, 1])
    m11 = np.einsum("...p,p->...", w, X[:, 1] * X[:, 1])
    det = m00 * m11 - m01 * m01
    full_inv = np.linalg.inv(X.T @ X)
    ok = (np.abs(det) > 1e-12) & (keep.sum(axis=-1) >= 3)
    safe = np.where(ok, det, 1.0)
    out = np.empty(keep.shape[:-1] + (2, 2), dtype=np.float64)
    out[..., 0, 0] = np.where(ok, m11 / safe, full_inv[0, 0])
    out[..., 0, 1] = np.where(ok, -m01 / safe, full_inv[0, 1])
    out[..., 1, 0] = out[..., 0, 1]
    out[..., 1, 1] = np.where(ok, m00 / safe, full_inv[1, 1])
    return out


def tree_sum_last(x: jnp.ndarray) -> jnp.ndarray:
    """Sum over the last axis as a fixed halving tree of binary adds.

    Bitwise deterministic across program shapes and fusion contexts, unlike
    ``jnp.sum``/``dot``, whose reduction order XLA may reassociate per
    program.  Used for every reduction whose result feeds an order
    comparison (LTS rank selection, funnel/argmin objectives) so candidate
    choices are identical in every compiled variant of the pipeline
    (single-array, merged multi-array, sharded).  Cost: ceil(log2 P)
    elementwise adds; zero-padding to a power of two is exact.
    """
    n = x.shape[-1]
    p = 1 << max(n - 1, 0).bit_length()
    if p != n:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, p - n)])
    while p > 1:
        p //= 2
        x = x[..., :p] + x[..., p:2 * p]
    return x[..., 0]


def masked_refit(
    tau: jnp.ndarray,        # (..., P)
    X: jnp.ndarray,          # (P, 2)
    weight: jnp.ndarray,     # (..., P) 0/1 subset weights
    eps: float = 1e-12,
) -> jnp.ndarray:
    """Weighted 2x2 normal-equation solve; the LTS C-step refit primitive.

    Returns s (..., 2).  Degenerate subsets (singular normal matrix) return
    zeros — callers mask them out via the objective.  Reductions are fixed
    binary trees (`tree_sum_last`): the refit feeds the LTS rank
    comparisons, which must resolve identically in every program shape.
    """
    Xw = weight[..., None] * X                          # (..., P, 2)
    m00 = tree_sum_last(Xw[..., 0] * X[..., 0])
    m01 = tree_sum_last(Xw[..., 0] * X[..., 1])
    m11 = tree_sum_last(Xw[..., 1] * X[..., 1])
    b0 = tree_sum_last(weight * tau * X[..., 0])
    b1 = tree_sum_last(weight * tau * X[..., 1])
    det = m00 * m11 - m01 * m01
    ok = jnp.abs(det) > eps
    safe = jnp.where(ok, det, 1.0)
    s0 = (b0 * m11 - b1 * m01) / safe
    s1 = (b1 * m00 - b0 * m01) / safe
    s = jnp.stack([jnp.where(ok, s0, 0.0), jnp.where(ok, s1, 0.0)], axis=-1)
    return s
