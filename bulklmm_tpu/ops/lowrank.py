"""Low-rank kinship engine: LMM scans without the n x n eigendecomposition.

The full-rank engines (ops/rotation.py + ops/liteqtl.py) decompose K on the
HOST (float64 LAPACK ``eigh``, O(n^3)) and upload the (n, n) eigenvector
matrix — at cohort scale (n >= 20k) that wall-clock wall (minutes of host
eigh, GBs of upload) dominates everything (SURVEY.md "hard parts"). This
module replaces the full decomposition with the top-k eigenpairs
``K ~= U diag(lam) U^T`` and evaluates the LMM *exactly for that rank-k
kinship* via the Woodbury-style identity (all quantities unrotated):

    (delta K + I)^{-1} = I + U diag(w - 1) U^T,   w_i = 1/(delta lam_i + 1)
    log|delta K + I|   = -sum_i log w_i

so every quadratic form the WLS/likelihood needs is a *base* (unweighted)
term plus a k-dimensional correction:

    a' (delta K + I)^{-1} b = a'b + (U'a)' diag(w - 1) (U'b)

On TPU this is a pure-GEMM reformulation of the per-trait correlation
kernel (ops/liteqtl.py): the h2-independent base Grams (X'Y, X'C, ...) are
computed ONCE, and the per-trait-weight corrections become (p, k)(k, m)
GEMMs with the per-trait weight factors folded elementwise into the
(k, m) projection — the same static-GEMM trick the full-rank kernel uses,
but with k in place of n. For k << n the scan is cheaper than full rank
AND the O(n^3) host eigh + (n, n) upload disappear entirely.

Top-k eigenpairs come from device-side randomized subspace iteration
(GEMM-only; Halko, Martinsson & Tropp 2011): panel orthonormalization by
CholeskyQR2 (Gram + small host Cholesky — tall-skinny Householder QR is
slow on TPU), and one small host eigh of the (l, l) projected matrix.
``kinship_lowrank_from_geno`` never materializes K at all — its matvec
applies the reference kinship definition (reference src/kinship.jl:4-13:
K = 2 X X'/p + 0.5 with unit diagonal) implicitly from the genotype
matrix, so n x n never exists anywhere.

Truncation semantics: results are the exact LMM for the truncated kinship
``U diag(lam) U'``; the deviation from the full-K LMM is controlled by the
discarded tail (weights differ by O(delta * lam_{k+1})).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.config import DEFAULT_PRECISION, PrecisionConfig, with_highest_matmul
from .lod import r2lod
from .smallchol import fwd_subst, pair_indices, residual_sq, unrolled_cholesky

_LN10 = math.log(10.0)
_MAX_DELTA = 1e18  # same h2 -> 1 clamp as ops/weights.py


class LowRankKinship(NamedTuple):
    """Top-k eigenpairs of a kinship matrix: ``K ~= U diag(lam) U^T``.

    U: (n, k) orthonormal columns; lam: (k,) nonnegative, descending.
    """

    U: jnp.ndarray
    lam: jnp.ndarray

    @property
    def n(self) -> int:
        return self.U.shape[0]

    @property
    def rank(self) -> int:
        return self.U.shape[1]


def _correction_weights(h2, lam):
    """(w - 1) correction factors; broadcasts like ops/weights.make_weights.

    w_i = 1/(delta lam_i + 1) with delta = h2/(1-h2) (clamped at the h2=1
    endpoint like the full-rank path).
    """
    h2 = jnp.asarray(h2)
    delta = jnp.clip(h2 / (1.0 - h2), -_MAX_DELTA, _MAX_DELTA)
    if h2.ndim == 0:
        return 1.0 / (delta * lam + 1.0) - 1.0
    return 1.0 / (delta[..., None] * lam + 1.0) - 1.0


# ---------------------------------------------------------------------------
# constructors
# ---------------------------------------------------------------------------


def _cholqr2(Y, gemm_precision):
    """Orthonormalize the columns of a tall-skinny panel by CholeskyQR2.

    Two rounds of: (n, l) Gram on DEVICE -> tiny (l, l) float64 Cholesky +
    inverse on the HOST -> one device GEMM-apply ``Y @ inv(L)^T``. Only
    plain GEMMs run on device (tall-skinny Householder QR and large-RHS
    triangular solves are TPU slow paths, and a monolithic jitted
    chol/solve pipeline measured minutes of compile); the host factors cost
    microseconds and one small fetch each.
    """
    l = Y.shape[1]
    eps = float(jnp.finfo(Y.dtype).eps)  # Gram accuracy is the COMPUTE dtype's
    for _ in range(2):
        G = np.asarray(
            jnp.matmul(Y.T, Y, precision=gemm_precision), dtype=np.float64
        )
        # jitter relative to the compute dtype: the Gram squares the panel's
        # condition number, and a spectrally-concentrated operator collapses
        # the panel toward its dominant eigenspace between orthonormalizations
        jitter = 100.0 * eps * (np.trace(G) / l)
        try:
            L = np.linalg.cholesky(G + jitter * np.eye(l))
            apply = np.linalg.inv(L).T
        except np.linalg.LinAlgError:
            # numerically semidefinite panel: eigh-based whitening
            # (Y V w^{-1/2} has orthonormal columns; floored eigenvalues
            # re-randomize the collapsed directions on the next matvec)
            w, V = np.linalg.eigh(0.5 * (G + G.T))
            w = np.maximum(w, eps * max(w.max(), 1.0))
            apply = V * (1.0 / np.sqrt(w))[None, :]
        Y = jnp.matmul(Y, jnp.asarray(apply, dtype=Y.dtype),
                       precision=gemm_precision)
    return Y


def _randomized_eigh(matvec, n, k, *, oversample, iters, seed, dtype, gemm_precision):
    """Top-k eigenpairs of an implicit symmetric PSD operator via subspace
    iteration (Halko et al. 2011). ``matvec`` maps (n, l) -> (n, l) on
    device; all heavy work is eager device GEMMs, the host handles only
    (l, l)-scale factorizations."""
    l = min(n, k + oversample)
    key = jax.random.PRNGKey(seed)
    Q = _cholqr2(jax.random.normal(key, (n, l), dtype=dtype), gemm_precision)
    for _ in range(iters):
        Q = _cholqr2(matvec(Q), gemm_precision)
    B = np.asarray(jnp.matmul(Q.T, matvec(Q), precision=gemm_precision), np.float64)
    B = 0.5 * (B + B.T)
    evals, evecs = np.linalg.eigh(B)  # (l, l) host eigh — small
    order = np.argsort(evals)[::-1][:k]
    lam = np.maximum(evals[order], 0.0)
    U = jnp.matmul(Q, jnp.asarray(evecs[:, order], dtype=dtype),
                   precision=gemm_precision)
    return LowRankKinship(U=U, lam=jnp.asarray(lam, dtype=dtype))


def kinship_lowrank(
    K,
    k: int,
    *,
    oversample: int = 10,
    iters: int = 4,
    seed: int = 0,
    precision: PrecisionConfig = DEFAULT_PRECISION,
) -> LowRankKinship:
    """Top-k eigenpairs of an explicit (n, n) kinship via device-side
    randomized subspace iteration — O(n^2 k) GEMMs instead of the host's
    O(n^3) eigh, no (n, n) eigenvector upload."""
    dtype = precision.resolve_solve()
    Kd = jnp.asarray(K, dtype=dtype)

    def matvec(Q):
        # HIGH (bf16x3) for range finding — self-correcting across
        # iterations; the final Rayleigh quotient runs at gemm_precision
        return jnp.matmul(Kd, Q, precision=jax.lax.Precision.HIGH)

    return _randomized_eigh(
        matvec, Kd.shape[0], k, oversample=oversample, iters=iters, seed=seed,
        dtype=dtype, gemm_precision=precision.gemm_precision,
    )


def kinship_lowrank_from_geno(
    geno,
    k: int,
    *,
    oversample: int = 10,
    iters: int = 4,
    seed: int = 0,
    precision: PrecisionConfig = DEFAULT_PRECISION,
) -> LowRankKinship:
    """Top-k eigenpairs of ``calc_kinship(geno)`` WITHOUT materializing the
    (n, n) kinship: the matvec applies the reference definition
    (2 X X'/p + 0.5, unit diagonal; reference src/kinship.jl:4-13) as
    genotype GEMMs + a rank-1 + diagonal term. Use when n^2 itself is the
    memory wall (n ~ 10^5)."""
    dtype = precision.resolve_solve()
    Gd = jnp.asarray(geno, dtype=dtype)
    n, p = Gd.shape
    # The -0.5 shift is folded in algebraically (X = G - 0.5 J is a rank-1
    # update), so the shifted (n, p) matrix is never materialized — at
    # cohort scale that is a full second copy of the genotype panel.
    # Subspace GEMMs run at Precision.HIGH (bf16x3): range-finding is
    # self-correcting across iterations, and HIGHEST's three bf16 operand
    # copies of the genotype panel are the difference between fitting in
    # HBM and OOM; the final Rayleigh quotient and eigenvector assembly in
    # _randomized_eigh stay at the configured (HIGHEST) precision.
    iter_prec = jax.lax.Precision.HIGH
    xx = jax.jit(lambda A: jnp.sum((A - 0.5) ** 2, axis=1))(Gd)  # fused, no copy
    dfix = 1.0 - (2.0 * xx / p + 0.5)  # K_ii = 1 replaces 2|x_i|^2/p + 0.5

    def matvec(Q):
        csum = jnp.sum(Q, axis=0, keepdims=True)  # (1, l)
        XtQ = jnp.matmul(Gd.T, Q, precision=iter_prec) - 0.5 * csum  # (p, l)
        XXtQ = (
            jnp.matmul(Gd, XtQ, precision=iter_prec)
            - 0.5 * jnp.sum(XtQ, axis=0, keepdims=True)
        )
        return (2.0 / p) * XXtQ + 0.5 * csum + dfix[:, None] * Q

    return _randomized_eigh(
        matvec, n, k, oversample=oversample, iters=iters, seed=seed,
        dtype=dtype, gemm_precision=precision.gemm_precision,
    )


def kinship_lowrank_exact(K, k: int, *, dtype=None) -> LowRankKinship:
    """Top-k eigenpairs by host float64 eigh (exact; for tests and modest n)."""
    lam_all, U_all = np.linalg.eigh(np.asarray(K, dtype=np.float64))
    order = np.argsort(lam_all)[::-1][:k]
    dt = dtype if dtype is not None else jnp.asarray(K).dtype
    return LowRankKinship(
        U=jnp.asarray(U_all[:, order], dtype=dt),
        lam=jnp.asarray(np.maximum(lam_all[order], 0.0), dtype=dt),
    )


# ---------------------------------------------------------------------------
# likelihood grid + per-trait correlation kernel
# ---------------------------------------------------------------------------


def _ell_from_parts(rss0, logw_sum, Lc, n, c, prior, reml):
    """Same (RE)ML formulas as ops/wls.py::wls_ell, with sum(log w) supplied
    directly (= -log|delta K + I|, the complement directions contribute 0)."""
    prior_a, prior_b = prior
    prior_df = prior_b + 2.0 if prior_b > 0.0 else prior_b
    denom = (n - c if reml else n) + prior_df
    sigma2 = (rss0 + prior_a * prior_b) / denom
    ell = -0.5 * (
        (n + prior_b) * jnp.log(sigma2) - logw_sum + (rss0 + prior_a * prior_b) / sigma2
    )
    if reml:
        logdet = 2.0 * sum(jnp.log(jnp.abs(Lc[(i, i)])) for i in range(c))
        ell = ell + 0.5 * (c * jnp.log(sigma2) - logdet)
    return ell, sigma2


def grid_null_ell_lowrank(parts, lam, h2_grid, prior, *, n, reml=False):
    """(g, m) null log-likelihoods over the h2 grid from precomputed base
    Grams + k-dim projections (see :func:`_base_parts`)."""
    CtC, CtY, yty, R, Q = (
        parts["CtC"], parts["CtY"], parts["yty"], parts["R"], parts["Q"]
    )
    c = CtC.shape[0]

    def ell_one(h2):
        dm1 = _correction_weights(h2, lam)  # (k,)
        Qd = dm1[:, None] * Q  # (k, m)
        yWy = yty + jnp.sum(Q * Qd, axis=0)
        t = CtY + jnp.matmul(R.T, Qd)  # (c, m)
        G = {}
        for a in range(c):
            for b in range(a, c):
                G[(a, b)] = CtC[a, b] + jnp.sum(R[:, a] * R[:, b] * dm1)
        Lc = unrolled_cholesky(G, c)
        zeta = fwd_subst(Lc, [t[a] for a in range(c)], c)
        rss0 = residual_sq(yWy, zeta)
        logw_sum = jnp.sum(jnp.log1p(dm1))
        ell, _ = _ell_from_parts(rss0, logw_sum, Lc, n, c, prior, reml)
        return ell

    return jax.vmap(ell_one)(h2_grid)


def _marker_parts(Xm, C, lr, *, gemm_dtype, kernel_dtype, gemm_precision):
    """Trait-independent Grams and k-dim projections (computed once per
    scan, shared by every trait chunk)."""
    gd, sd, pgp = gemm_dtype, kernel_dtype, gemm_precision
    X, Cg, U = Xm.astype(gd), C.astype(gd), lr.U.astype(gd)
    return dict(
        XtC=jnp.matmul(X.T, Cg, precision=pgp).astype(sd),   # (p, c)
        dXX=jnp.sum((X * X).astype(sd), axis=0),             # (p,)
        P=jnp.matmul(U.T, X, precision=pgp).astype(sd),      # (k, p)
        R=jnp.matmul(U.T, Cg, precision=pgp).astype(sd),     # (k, c)
        CtC=jnp.matmul(Cg.T, Cg, precision=pgp).astype(sd),  # (c, c)
    )


def _trait_parts(Y, Xm, C, lr, *, gemm_dtype, kernel_dtype, gemm_precision):
    """Per-trait(-chunk) Grams and k-dim projections."""
    gd, sd, pgp = gemm_dtype, kernel_dtype, gemm_precision
    X, Yg, Cg, U = (Xm.astype(gd), Y.astype(gd), C.astype(gd), lr.U.astype(gd))
    return dict(
        XtY=jnp.matmul(X.T, Yg, precision=pgp).astype(sd),   # (p, m)
        Q=jnp.matmul(U.T, Yg, precision=pgp).astype(sd),     # (k, m)
        CtY=jnp.matmul(Cg.T, Yg, precision=pgp).astype(sd),  # (c, m)
        yty=jnp.sum((Yg * Yg).astype(sd), axis=0),           # (m,)
    )


def _base_parts(Y, Xm, C, lr, *, gemm_dtype, kernel_dtype, gemm_precision):
    """h2-independent Grams and k-dim projections (each computed once)."""
    kw = dict(gemm_dtype=gemm_dtype, kernel_dtype=kernel_dtype,
              gemm_precision=gemm_precision)
    return {**_marker_parts(Xm, C, lr, **kw), **_trait_parts(Y, Xm, C, lr, **kw)}


def lods_per_trait_lowrank(
    parts, lam, h2_per_trait, n, *, precision: PrecisionConfig = DEFAULT_PRECISION
):
    """(p, m) LOD matrix with a distinct h2 per trait, rank-k weights.

    Identical epilogue to ops/liteqtl.py::weighted_correlation_per_trait
    (unrolled Cholesky + forward substitution + residual floors); the
    h2-dependent terms are (p, k)(k, m) GEMMs with the per-trait weight
    corrections folded elementwise into the (k, m) projections.
    """
    from .liteqtl import _fast_log

    pgp = precision.gemm_precision
    P, Q, R = parts["P"], parts["Q"], parts["R"]
    c = parts["CtC"].shape[0]

    Dm1 = _correction_weights(h2_per_trait, lam).T  # (k, m)
    Qd = Dm1 * Q  # (k, m)

    # trait-side scalars
    yWy = parts["yty"] + jnp.sum(Q * Qd, axis=0)  # (m,)
    t = parts["CtY"] + jnp.matmul(R.T, Qd, precision=pgp)  # (c, m)
    pairs = pair_indices(c)
    RR = jnp.stack([R[:, a] * R[:, b] for a, b in pairs], axis=1)  # (k, npair)
    Gv = jnp.matmul(RR.T, Dm1, precision=pgp)  # (npair, m)
    Gd = {ab: parts["CtC"][ab[0], ab[1]] + Gv[i] for i, ab in enumerate(pairs)}
    Lc = unrolled_cholesky(Gd, c)
    zeta = fwd_subst(Lc, [t[a] for a in range(c)], c)
    nrm2 = residual_sq(yWy, zeta)

    # marker-side (p, m) terms: base + rank-k correction GEMMs
    B = parts["XtY"] + jnp.matmul(P.T, Qd, precision=pgp)  # (p, m)
    Uc = [
        parts["XtC"][:, a][:, None]
        + jnp.matmul(P.T, Dm1 * R[:, a][:, None], precision=pgp)
        for a in range(c)
    ]  # c x (p, m)
    D1 = parts["dXX"][:, None] + jnp.matmul((P * P).T, Dm1, precision=pgp)  # (p, m)

    Z = fwd_subst(Lc, Uc, c)
    N = B
    for a in range(c):
        N = N - Z[a] * zeta[a][None, :]
    D = residual_sq(D1, Z)
    r = N / jnp.sqrt(D * nrm2[None, :])
    return r2lod(r, n, fast_log=_fast_log(precision))


_STATIC_LR = ("prior", "reml", "precision")


@partial(jax.jit, static_argnames=_STATIC_LR + ("n", "trait_chunk"))
@with_highest_matmul
def _bulkscan_lowrank_core(
    Y, Xm, C, U, lam, h2_grid, *, n, prior, reml, precision, trait_chunk=None
):
    lr = LowRankKinship(U=U, lam=lam)
    kdt = precision.resolve_kernel()
    kw = dict(
        gemm_dtype=precision.resolve_gemm(), kernel_dtype=kdt,
        gemm_precision=precision.gemm_precision,
    )
    # marker-side parts once — shared across trait chunks
    mparts = _marker_parts(Xm, C, lr, **kw)
    lam_k = lam.astype(kdt)

    def impl(Yc):
        parts = {**mparts, **_trait_parts(Yc, Xm, C, lr, **kw)}
        ells = grid_null_ell_lowrank(
            parts, lam_k, h2_grid.astype(kdt), prior, n=n, reml=reml
        )
        idx = jnp.argmax(ells, axis=0)  # first max wins, like Julia findmax
        h2_list = h2_grid[idx]
        L = lods_per_trait_lowrank(
            parts, lam_k, h2_list.astype(kdt), n, precision=precision
        )
        return L, h2_list

    if trait_chunk is None:
        return impl(Y)
    from ..models.bulkscan import _chunk_traits

    return _chunk_traits(impl, Y, trait_chunk=trait_chunk)
