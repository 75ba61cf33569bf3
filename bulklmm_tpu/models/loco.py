"""Leave-one-chromosome-out (LOCO) scans.

TPU addition — the reference (BulkLMM.jl) always scans against the
whole-genome kinship (src/kinship.jl:4-13 feeds every scan), so markers are
tested against a relatedness matrix that *contains themselves*, causing
proximal contamination (deflated signals near true QTL). The standard GWAS
remedy (GEMMA ``-loco``, BOLT-LMM, regenie) is to scan each chromosome's
markers against a kinship built from all OTHER chromosomes.

Kinship algebra: ``calc_kinship`` is an affine function of the marker
cross-product, so the per-leave-out kinships are assembled from ONE pass of
per-chromosome Gram matrices — ``K_{-c} = 2 (A - A_c) / (p - p_c) + 0.5``
with ``A_c = X_c X_c^T`` (one MXU GEMM per chromosome, each marker touched
once) — rather than re-reading the panel per chromosome.

Each chromosome then runs the ordinary engines (``bulkscan`` / ``scan``)
against its own kinship; results are reassembled in the original marker
order. With ``lowrank_k`` the per-chromosome kinship is never materialized:
the rank-k factors come straight from the leave-out genotype block
(``kinship_lowrank_from_geno``) and the Woodbury engine runs unrotated —
the path for n beyond the host-eigh wall.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..utils.config import DEFAULT_PRECISION, PrecisionConfig
from .results import BulkScanResult, ScanResult

__all__ = ["loco_kinship", "bulkscan_loco", "scan_loco"]


def _chrom_masks(chromosome, p):
    chromosome = np.asarray(chromosome)
    if chromosome.shape[0] != p:
        raise ValueError(
            f"chromosome labels must have one entry per marker: got "
            f"{chromosome.shape[0]} labels for {p} markers"
        )
    order = list(dict.fromkeys(chromosome.tolist()))  # encounter order
    if len(order) < 2:
        raise ValueError(
            "LOCO needs markers on at least 2 chromosomes (the leave-out "
            "kinship would otherwise be empty)"
        )
    return order, {c: chromosome == c for c in order}


def loco_kinship(
    geno, chromosome, precision: PrecisionConfig = DEFAULT_PRECISION
):
    """Dict ``chrom -> K_{-chrom}`` (kinship from all other chromosomes).

    Exactly ``calc_kinship(geno[:, chromosome != c])`` for every c, computed
    from one pass of per-chromosome cross-product GEMMs.
    """
    dtype = precision.resolve_solve()
    G = np.asarray(geno)
    n, p = G.shape
    order, masks = _chrom_masks(chromosome, p)

    grams, counts = {}, {}
    total = jnp.zeros((n, n), dtype=dtype)
    for c in order:
        Xc = jnp.asarray(G[:, masks[c]], dtype=dtype) - 0.5
        grams[c] = jnp.matmul(Xc, Xc.T, precision=precision.gemm_precision)
        counts[c] = Xc.shape[1]
        total = total + grams[c]

    out = {}
    for c in order:
        p_rest = p - counts[c]
        K = 2.0 * (total - grams[c]) / p_rest + 0.5
        out[c] = jnp.fill_diagonal(K, 1.0, inplace=False)
    return out


def _loco_parts(G, chromosome, *, lowrank_k, precision):
    """Per-chromosome (mask, K) pairs — dense LOCO kinships or rank-k
    factors straight from the leave-out genotype block."""
    G = np.asarray(G)
    order, masks = _chrom_masks(chromosome, G.shape[1])
    if lowrank_k:
        from ..ops.lowrank import kinship_lowrank_from_geno

        Ks = {
            c: kinship_lowrank_from_geno(
                G[:, ~masks[c]], lowrank_k, precision=precision
            )
            for c in order
        }
    else:
        Ks = loco_kinship(G, chromosome, precision=precision)
    return G, order, masks, Ks


def bulkscan_loco(
    Y,
    G,
    chromosome,
    covar=None,
    *,
    lowrank_k: int = 0,
    precision: PrecisionConfig = DEFAULT_PRECISION,
    **kwargs,
) -> BulkScanResult:
    """Multi-trait LOCO scan: each chromosome's markers against the kinship
    of all other chromosomes, reassembled in the original marker order.

    ``chromosome``: (p,) labels (e.g. ``read_gmap(...).chromosome``).
    ``lowrank_k`` > 0 uses the rank-k engine per chromosome (no n x n
    kinship, no host eigh). Remaining keywords go to :func:`bulkscan`
    (method, reml, output_pvals, output_effects, trait_chunk, ...).
    Per-trait null h2 is chromosome-specific; ``h2_null_by_chrom`` maps
    ``chrom -> (m,)`` (or ``(p_c, m)`` panels for alt-grid).
    """
    from .bulkscan import bulkscan

    G, order, masks, Ks = _loco_parts(
        G, chromosome, lowrank_k=lowrank_k, precision=precision
    )
    Y2 = np.asarray(Y)
    Y2 = Y2[:, None] if Y2.ndim == 1 else Y2
    p, m = G.shape[1], Y2.shape[1]

    L = np.empty((p, m), dtype=np.float64)
    pvals = effects = None
    h2_by_chrom = {}
    for c in order:
        res = bulkscan(Y2, G[:, masks[c]], Ks[c], covar,
                       precision=precision, **kwargs)
        idx = np.flatnonzero(masks[c])
        L[idx] = np.asarray(res.L)
        h2_by_chrom[c] = (
            res.h2_null_list if res.h2_null_list is not None else res.h2_panel
        )
        if res.log10Pvals_mat is not None:
            if pvals is None:
                pvals = np.empty((p, m), dtype=np.float64)
            pvals[idx] = np.asarray(res.log10Pvals_mat)
        if res.beta_mat is not None:
            if effects is None:
                effects = (np.empty((p, m)), np.empty((p, m)))
            effects[0][idx] = np.asarray(res.beta_mat)
            effects[1][idx] = np.asarray(res.beta_se_mat)

    result = BulkScanResult(L=L)
    result.h2_null_by_chrom = h2_by_chrom
    if pvals is not None:
        result.log10Pvals_mat = pvals
        result.chisq_df = kwargs.get("chisq_df", 1)
    if effects is not None:
        result.beta_mat, result.beta_se_mat = effects
    return result


def scan_loco(
    y,
    G,
    chromosome,
    covar=None,
    *,
    lowrank_k: int = 0,
    precision: PrecisionConfig = DEFAULT_PRECISION,
    **kwargs,
) -> ScanResult:
    """Single-trait LOCO scan (see :func:`bulkscan_loco`).

    Remaining keywords go to :func:`scan` (assumption, reml,
    permutation_test/nperms/rndseed, output_pvals, output_effects, ...).
    The null model is chromosome-specific: ``h2_null_by_chrom`` /
    ``sigma2_by_chrom`` map ``chrom -> scalar``; ``h2_null`` / ``sigma2_e``
    hold the across-chromosome means for a quick summary.
    """
    from .scan import scan

    if kwargs.get("profile_ll"):
        raise ValueError(
            "profile_ll is a single-(marker, kinship) diagnostic; run "
            "scan(profile_ll=True) against the wanted LOCO kinship directly"
        )
    G, order, masks, Ks = _loco_parts(
        G, chromosome, lowrank_k=lowrank_k, precision=precision
    )
    y = np.asarray(y, dtype=np.float64)
    p = G.shape[1]

    lod = np.empty(p, dtype=np.float64)
    h2_each = perms = pvals = pvals_perms = effects = None
    h2_by_chrom, s2_by_chrom = {}, {}
    for c in order:
        res = scan(y, G[:, masks[c]], Ks[c], covar,
                   precision=precision, **kwargs)
        idx = np.flatnonzero(masks[c])
        lod[idx] = np.asarray(res.lod)
        h2_by_chrom[c] = float(res.h2_null)
        s2_by_chrom[c] = float(res.sigma2_e)
        if res.h2_each_marker is not None:
            if h2_each is None:
                h2_each = np.empty(p, dtype=np.float64)
            h2_each[idx] = np.asarray(res.h2_each_marker)
        if res.L_perms is not None:
            if perms is None:
                perms = np.empty((p, res.L_perms.shape[1]), dtype=np.float64)
            perms[idx] = np.asarray(res.L_perms)
        if res.log10pvals is not None:
            if pvals is None:
                pvals = np.empty(p, dtype=np.float64)
            pvals[idx] = np.asarray(res.log10pvals)
        if res.log10Pvals_perms is not None:
            if pvals_perms is None:
                pvals_perms = np.empty(
                    (p, res.log10Pvals_perms.shape[1]), dtype=np.float64
                )
            pvals_perms[idx] = np.asarray(res.log10Pvals_perms)
        if res.beta is not None:
            if effects is None:
                effects = (np.empty(p), np.empty(p))
            effects[0][idx] = np.asarray(res.beta)
            effects[1][idx] = np.asarray(res.beta_se)

    result = ScanResult(
        sigma2_e=float(np.mean(list(s2_by_chrom.values()))),
        h2_null=float(np.mean(list(h2_by_chrom.values()))),
        lod=lod,
        h2_each_marker=h2_each,
        L_perms=perms,
        log10pvals=pvals,
        log10Pvals_perms=pvals_perms,
    )
    if effects is not None:
        result.beta, result.beta_se = effects
    result.h2_null_by_chrom = h2_by_chrom
    result.sigma2_by_chrom = s2_by_chrom
    return result
