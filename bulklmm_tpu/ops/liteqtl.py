"""LiteQTL correlation->LOD kernels, re-derived for the MXU.

The reference computes, for each trait j with weight vector w_j, the
correlation of every (covariate-residualized, weighted) marker with the
(covariate-residualized, weighted) trait, then maps r -> LOD
(src/bulkscan_helpers.jl:47-64 ``computeR_LMM`` + :22-24 ``r2lod``). To batch
traits with *different* h2, the reference groups traits into h2-bins and runs
one CPU GEMM per bin (src/bulkscan_helpers.jl:271-288) — a dynamic-shape,
cache-locality trick that maps poorly to XLA.

TPU-native reformulation (this module): let s_j = sqrt(w_j),
Ctil_j = s_j * C (weighted covariates) with orthonormal basis Q_j, and
yhat_j the normalized residual of s_j * y_j against Ctil_j. Because
yhat_j is orthogonal to Ctil_j, the numerator of the partial correlation
needs no residualization of the marker:

  N[i,j]  = sum_n X[n,i] * s_j[n] * yhat_j[n]                 (one GEMM)
  D[i,j]  = sum_n X[n,i]^2 * w_j[n]                            (one GEMM)
            - sum_k ( sum_n X[n,i] * s_j[n] * Q_j[n,k] )^2     (c GEMMs)
  r[i,j]  = N / sqrt(D),   LOD = -(n/2) log10(1 - r^2)

So arbitrary per-trait weights cost (c+2) dense (p x m) MXU GEMMs with
static shapes — exact per-trait h2 (no grid binning needed), and the same
kernel serves null-exact, null-grid, and the permutation scan.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from ..utils.config import DEFAULT_PRECISION, PrecisionConfig
from .lod import r2lod
from .weights import make_weights


def _weighted_covar_basis(C0, W):
    """Orthonormal bases of the per-trait weighted covariates.

    C0: (n, c); W: (m, n) per-trait weights. Returns Q: (m, n, c) with
    Q_j an orthonormal basis of diag(sqrt(w_j)) @ C0, built GEMM-style via
    batched Cholesky of the (c, c) Grams (c is tiny: intercept + covariates).
    """
    S = jnp.sqrt(W)  # (m, n)
    Ct = S[:, :, None] * C0[None, :, :]  # (m, n, c)
    gram = jnp.einsum("mnc,mnd->mcd", Ct, Ct)  # (m, c, c)
    L = jnp.linalg.cholesky(gram)
    # Q = Ct @ L^{-T}  (solve L Z^T = Ct^T per batch)
    Q = solve_triangular(L, jnp.swapaxes(Ct, 1, 2), lower=True)  # (m, c, n)
    return jnp.swapaxes(Q, 1, 2)  # (m, n, c)


def weighted_residual_traits(Y0, C0, W) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Weighted, covariate-residualized, unit-norm traits.

    Returns (yhat (n, m), S (m, n), Q (m, n, c)).
    """
    S = jnp.sqrt(W)  # (m, n)
    Q = _weighted_covar_basis(C0, W)  # (m, n, c)
    sy = Y0 * S.T  # (n, m)
    t = jnp.einsum("mnc,nm->mc", Q, sy)
    ytil = sy - jnp.einsum("mnc,mc->nm", Q, t)
    norms = jnp.sqrt(jnp.sum(ytil * ytil, axis=0))
    yhat = ytil / norms
    return yhat, S, Q


def weighted_correlation_per_trait(
    Y0,
    X0m,
    C0,
    lam,
    h2_per_trait,
    *,
    precision: PrecisionConfig = DEFAULT_PRECISION,
) -> jnp.ndarray:
    """(p, m) partial correlations with a distinct h2 (weight vector) per trait.

    Y0: (n, m) rotated traits; X0m: (n, p) rotated markers; C0: (n, c)
    rotated covariates; lam: (n,) eigenvalues; h2_per_trait: (m,).

    Weight guard mirrors the reference's ``sqrt.(abs.(makeweights(...)))``
    (src/bulkscan_helpers.jl:138) for slightly negative kinship eigenvalues.
    """
    gdt = precision.resolve_gemm()
    pgp = precision.gemm_precision

    W = jnp.abs(make_weights(h2_per_trait, lam))  # (m, n)
    yhat, S, Q = weighted_residual_traits(Y0, C0, W)

    X = X0m.astype(gdt)
    A = (S.T * yhat).astype(gdt)  # (n, m)
    N = jnp.matmul(X.T, A, precision=pgp)  # (p, m)

    D = jnp.matmul((X * X).T, W.T.astype(gdt), precision=pgp)  # (p, m)
    c = C0.shape[1]
    for k in range(c):
        Bk = (S.T * Q[:, :, k].T).astype(gdt)  # (n, m)
        Pk = jnp.matmul(X.T, Bk, precision=pgp)  # (p, m)
        D = D - Pk * Pk

    return N / jnp.sqrt(D)


def weighted_correlation_shared(
    Y0,
    X0m,
    C0,
    lam,
    h2: float,
    *,
    precision: PrecisionConfig = DEFAULT_PRECISION,
) -> jnp.ndarray:
    """(p, m) correlations with one shared h2 across all columns of Y0.

    Specialization of the per-trait kernel: markers are residualized and
    normalized once, so the whole scan is a single (p x m) GEMM — the
    reference's ``weighted_liteqtl`` (src/bulkscan_helpers.jl:175-201) and the
    permutation hot path (src/scan.jl:534-543) reduce to this.
    """
    gdt = precision.resolve_gemm()
    pgp = precision.gemm_precision

    w = jnp.abs(make_weights(h2, lam))  # (n,)
    s = jnp.sqrt(w)
    Ct = C0 * s[:, None]
    q, _ = jnp.linalg.qr(Ct, mode="reduced")  # (n, c)

    def residualize_normalize(M):
        Mw = M * s[:, None]
        Mr = Mw - q @ (q.T @ Mw)
        return Mr / jnp.sqrt(jnp.sum(Mr * Mr, axis=0))

    X00 = residualize_normalize(X0m).astype(gdt)
    Y00 = residualize_normalize(Y0).astype(gdt)
    return jnp.matmul(X00.T, Y00, precision=pgp)


def lods_per_trait(Y0, X0m, C0, lam, h2_per_trait, *, precision=DEFAULT_PRECISION):
    """(p, m) LOD scores with per-trait h2 — the bulk-scan throughput core."""
    n = Y0.shape[0]
    R = weighted_correlation_per_trait(Y0, X0m, C0, lam, h2_per_trait, precision=precision)
    return r2lod(R, n)


def lods_shared(Y0, X0m, C0, lam, h2, *, precision=DEFAULT_PRECISION):
    """(p, m) LOD scores with one shared h2 across traits."""
    n = Y0.shape[0]
    R = weighted_correlation_shared(Y0, X0m, C0, lam, h2, precision=precision)
    return r2lod(R, n)
