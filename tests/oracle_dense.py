"""Independent-ALGORITHM float64 oracle: dense-Sigma LMM, no eigendecomposition.

Every engine path (and the rotation oracle in tests/oracle.py) runs the
FaST-LMM recipe: eigendecompose K once, rotate, and fit per-h2 *weighted*
least squares. Agreement among those is a cross-check of implementations of
the SAME algorithm. This module maximizes the Kang-2008 ML/REML likelihood
directly on the dense covariance

    Sigma = sigma2 * V(h2),   V(h2) = h2 * K + (1 - h2) * I

via an explicit Cholesky factorization of V at every candidate h2 — no
eigendecomposition, no rotation, no weights — with scipy bounded Brent over
h2. It therefore exercises a genuinely different computational path end to
end, standing in for the reference's R `lmmlite` golden-file comparison
(reference test/scan_test_lmmlite.jl:16-31) whose BXD inputs are LFS-missing
from the mount.

Likelihood convention: the engine (ops/wls.py, reference src/wls.jl:27-101)
evaluates the likelihood of the ROTATED model with weights
w = 1/(delta*lam + 1), delta = h2/(1-h2) — i.e. the model
y ~ N(Xb, sigma2_w * M), M = delta*K + I = V/(1-h2). Mapping the dense-V
quantities onto that convention (s = 1-h2):

    rss_w        = s * rss_V              (rss_V = GLS residual quadratic form)
    sum(log w)   = -log|M| = -(log|V| - n*log s)
    log|X'WX|    = log|X' M^-1 X| = p*log s + log|X' V^-1 X|

so the engine's ell formula can be evaluated exactly from dense-Cholesky
quantities; the s-terms cancel algebraically and the resulting ell equals the
engine's POINTWISE in h2 (including prior and REML terms), making optima and
LOD scores directly comparable.
"""

from __future__ import annotations

import numpy as np
from scipy.linalg import cho_factor, cho_solve, solve_triangular
from scipy.optimize import minimize_scalar

_LOG10 = np.log(10.0)


def _whiten(K, h2, *arrays):
    """Cholesky-whiten arrays by V(h2) = h2*K + (1-h2)*I.

    Returns (whitened arrays..., logdetV). Uses dense Cholesky only.
    """
    n = K.shape[0]
    V = h2 * K + (1.0 - h2) * np.eye(n)
    L = np.linalg.cholesky(V)
    logdetV = 2.0 * np.sum(np.log(np.diag(L)))
    out = [solve_triangular(L, np.asarray(a, dtype=np.float64), lower=True) for a in arrays]
    return (*out, logdetV)


def ell_dense(y, X, K, h2, prior=(0.0, 0.0), reml=False):
    """Engine-convention log-likelihood(s) at a fixed h2 via dense Cholesky.

    y: (n,) or (n, q); returns (ell (q,), sigma2_engine (q,), rss_w (q,),
    coef (p, q)). sigma2_engine is in the engine's weighted scale
    (sigma2_dense * (1 - h2)).
    """
    y = np.atleast_2d(np.asarray(y, dtype=np.float64).T).T
    X = np.asarray(X, dtype=np.float64)
    K = np.asarray(K, dtype=np.float64)
    n, p = X.shape
    a, b = prior
    s = 1.0 - h2

    ty, tX, logdetV = _whiten(K, h2, y, X)
    # GLS = OLS on the whitened problem (QR for stability)
    Q, R = np.linalg.qr(tX)
    coef = solve_triangular(R, Q.T @ ty, lower=False)
    r = ty - tX @ coef
    rss_V = np.sum(r * r, axis=0)
    # log|X' V^-1 X| from the same QR: X'V^-1X = R'R
    logdet_XVX = 2.0 * np.sum(np.log(np.abs(np.diag(R))))

    # map to the engine's weighted-model convention (module docstring)
    rss_w = s * rss_V
    sum_log_w = -(logdetV - n * np.log(s))
    logdet_XWX = p * np.log(s) + logdet_XVX

    prior_df = b + 2.0 if b > 0.0 else b
    denom = (n - p if reml else n) + prior_df
    sigma2 = np.maximum((rss_w + a * b) / denom, np.finfo(np.float64).tiny)
    ell = -0.5 * ((n + b) * np.log(sigma2) - sum_log_w + (rss_w + a * b) / sigma2)
    if reml:
        ell = ell + 0.5 * (p * np.log(sigma2) - logdet_XWX)
    return ell, sigma2, rss_w, coef


def fit_dense(y, X, K, prior=(0.0, 0.0), reml=False, ninterval=1):
    """Maximize the dense-Sigma likelihood over h2 by bounded Brent on
    [0, 1), optionally split into subintervals like the engine's gridbrent
    (reference src/gridbrent.jl)."""
    hi = 1.0 - 1e-9

    def negll(h2):
        return -ell_dense(y, X, K, h2, prior, reml=reml)[0][0]

    pts = np.linspace(0.0, hi, ninterval + 1)
    best = (np.inf, 0.5)
    for lo, up in zip(pts[:-1], pts[1:]):
        r = minimize_scalar(
            negll, bounds=(lo, up), method="bounded",
            options={"xatol": 1e-11, "maxiter": 500},
        )
        if r.fun < best[0]:
            best = (r.fun, float(r.x))
    h2 = best[1]
    ell, sigma2, rss_w, coef = ell_dense(y, X, K, h2, prior, reml=reml)
    return dict(b=coef, sigma2=sigma2[0], h2=h2, ell=ell[0])


def _design(y, g, covar=None, weights=None, K=None, add_intercept=True):
    """Replicate the engine's host-side data prep: intercept + optional
    weights rescale (rows scaled by w, K -> W K W; models/scan.py
    _apply_weights, reference src/scan.jl:201-227)."""
    y = np.atleast_2d(np.asarray(y, dtype=np.float64).T).T
    g = np.asarray(g, dtype=np.float64)
    n = y.shape[0]
    if covar is None:
        X0 = np.ones((n, 1))
    else:
        covar = np.asarray(covar, dtype=np.float64)
        covar = covar[:, None] if covar.ndim == 1 else covar
        X0 = np.concatenate([np.ones((n, 1)), covar], axis=1) if add_intercept else covar
    K = np.asarray(K, dtype=np.float64)
    if weights is not None:
        wv = np.asarray(weights, dtype=np.float64)
        y = y * wv[:, None]
        g = g * wv[:, None]
        X0 = X0 * wv[:, None]
        K = K * wv[:, None] * wv[None, :]
    return y, g, X0, K


def scan_null_dense(y, g, K, covar=None, weights=None, prior=(0.0, 0.0),
                    reml=False, ninterval=1, h2_override=None):
    """Null-VC single-trait scan, dense-Sigma path throughout.

    h2 is fit on the covariate-only model (dense Brent); per-marker LODs are
    RSS ratios of the V(h2_null)-whitened regressions — the whitening-scale
    s cancels in the log ratio, so this matches the engine's weighted-RSS
    LOD formula (reference src/scan.jl:411-459) with no rotation anywhere.

    ``h2_override`` skips the fit and evaluates the LOD pipeline at a given
    h2 (used by tests to separate optimizer localization from pipeline
    agreement; see tests/test_dense_oracle.py docstring).
    """
    y, g, X0, K = _design(y, g, covar, weights, K)
    n, p = g.shape
    if h2_override is None:
        fit0 = fit_dense(y, X0, K, prior, reml=reml, ninterval=ninterval)
    else:
        h2f = float(h2_override)
        ell, sigma2, _, coef = ell_dense(y, X0, K, h2f, prior, reml=reml)
        fit0 = dict(b=coef, sigma2=sigma2[0], h2=h2f, ell=ell[0])
    ty, tX0, tG, _ = _whiten(K, fit0["h2"], y, X0, g)

    def ols_rss(A, b):
        coef, *_ = np.linalg.lstsq(A, b, rcond=None)
        r = b - A @ coef
        return np.sum(r * r)

    rss0 = ols_rss(tX0, ty)
    c = X0.shape[1]
    lod = np.zeros(p)
    X = np.zeros((n, c + 1))
    X[:, :c] = tX0
    for i in range(p):
        X[:, c] = tG[:, i]
        lod[i] = (n / 2.0) * (np.log10(rss0) - np.log10(ols_rss(X, ty)))
    return dict(sigma2_e=fit0["sigma2"], h2_null=fit0["h2"], lod=lod)


def scan_alt_dense(y, g, K, covar=None, weights=None, prior=(0.0, 0.0),
                   reml=False, ninterval=1):
    """Per-marker exact-VC scan (assumption="alt", correctly-scaled-weights
    default): each marker model gets its own dense-Brent h2 fit; LOD is the
    dense log-likelihood ratio."""
    y, g, X0, K = _design(y, g, covar, weights, K)
    n, p = g.shape
    fit0 = fit_dense(y, X0, K, prior, reml=reml, ninterval=ninterval)
    lod = np.zeros(p)
    h2s = np.zeros(p)
    for i in range(p):
        X = np.concatenate([X0, g[:, i : i + 1]], axis=1)
        fit1 = fit_dense(y, X, K, prior, reml=reml, ninterval=ninterval)
        lod[i] = (fit1["ell"] - fit0["ell"]) / _LOG10
        h2s[i] = fit1["h2"]
    return dict(sigma2_e=fit0["sigma2"], h2_null=fit0["h2"], lod=lod,
                h2_each_marker=h2s)


def bulkscan_null_grid_dense(Y, g, K, h2_grid, covar=None, prior=(0.0, 0.0),
                             reml=False):
    """Grid-h2 multi-trait scan, dense path: per trait, pick the grid h2
    maximizing the dense null likelihood, then LOD via whitened-RSS ratios
    under that h2 (reference src/bulkscan.jl null-grid semantics)."""
    Y = np.asarray(Y, dtype=np.float64)
    Y = Y[:, None] if Y.ndim == 1 else Y
    m = Y.shape[1]
    _, g2, X0, K2 = _design(Y[:, :1], g, covar, None, K)
    n, p = g2.shape
    h2_grid = np.asarray(h2_grid, dtype=np.float64)
    ells = np.zeros((len(h2_grid), m))
    for j, h2 in enumerate(h2_grid):
        ells[j] = ell_dense(Y, X0, K2, float(h2), prior, reml=reml)[0]
    pick = np.argmax(ells, axis=0)
    lod = np.zeros((p, m))
    h2_out = h2_grid[pick]
    for t in range(m):
        h2 = float(h2_grid[pick[t]])
        ty, tX0, tG, _ = _whiten(K2, h2, Y[:, t : t + 1], X0, g2)

        def ols_rss(A, b):
            coef, *_ = np.linalg.lstsq(A, b, rcond=None)
            r = b - A @ coef
            return np.sum(r * r)

        rss0 = ols_rss(tX0, ty)
        c = X0.shape[1]
        X = np.zeros((n, c + 1))
        X[:, :c] = tX0
        for i in range(p):
            X[:, c] = tG[:, i]
            lod[i, t] = (n / 2.0) * (np.log10(rss0) - np.log10(ols_rss(X, ty)))
    return dict(lod=lod, h2_null=h2_out)


def effects_dense(y, g, K, h2, covar=None, weights=None):
    """Per-marker GLS effect sizes + Wald SEs at a FIXED h2, dense-Sigma
    path: V(h2)-whiten, then per-marker OLS of ty on [tC, tx_j] with the
    per-marker unbiased residual variance rss_j / (n - c - 1) (the
    engine's GEMMA-style Wald convention, models/scan.py
    _effects_from_whitened) — no eigendecomposition anywhere."""
    y, g, X0, K = _design(y, g, covar, weights, K)
    n, p = g.shape
    c = X0.shape[1]
    ty, tX0, tG, _ = _whiten(K, float(h2), y, X0, g)
    beta = np.zeros(p)
    se = np.zeros(p)
    dof = max(n - c - 1, 1)
    for j in range(p):
        A = np.column_stack([tX0, tG[:, j]])
        coef, *_ = np.linalg.lstsq(A, ty, rcond=None)
        r = ty - A @ coef
        rss = float(np.sum(r * r))
        XtX_inv = np.linalg.inv(A.T @ A)
        beta[j] = coef[-1, 0]
        se[j] = np.sqrt(rss / dof * XtX_inv[-1, -1])
    return beta, se
