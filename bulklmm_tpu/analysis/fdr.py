"""False-discovery-rate control (no reference counterpart).

The reference offers only family-wise-error thresholds via permutation
maxima (reference src/analysis_helpers/single_trait_analysis.jl:13-23). For
eQTL-scale scans (millions of tests) FDR is the standard complement; this
module adds Benjamini-Hochberg / Benjamini-Yekutieli adjustment over LOD
matrices.
"""

from __future__ import annotations

import numpy as np

from ..ops.lod import lod2p


def bh_adjust(pvals, *, dependent: bool = False) -> np.ndarray:
    """Benjamini-Hochberg (or Benjamini-Yekutieli if ``dependent``) adjusted
    p-values (q-values), preserving the input shape."""
    p = np.asarray(pvals, dtype=np.float64)
    flat = p.ravel()
    # NaN p-values (degenerate inputs) get NaN q-values but must NOT poison
    # the rest: argsort puts NaN last, and minimum.accumulate from the tail
    # would otherwise turn EVERY q-value into NaN
    valid = ~np.isnan(flat)
    out = np.full_like(flat, np.nan)
    v = flat[valid]
    n = v.size
    if n:
        order = np.argsort(v)
        ranked = v[order]
        scale = n / np.arange(1, n + 1)
        if dependent:
            scale = scale * np.sum(1.0 / np.arange(1, n + 1))
        q = ranked * scale
        # enforce monotonicity from the largest p down
        q = np.minimum.accumulate(q[::-1])[::-1]
        qo = np.empty_like(v)
        qo[order] = np.clip(q, 0.0, 1.0)
        out[valid] = qo
    return out.reshape(p.shape)


def lod_fdr(L, df: int = 1, *, alpha: float = 0.05, dependent: bool = False):
    """(qvals, significant_mask) for a LOD matrix via chi-square p-values +
    Benjamini-Hochberg.

    ``L``: any-shape LOD array (e.g. the (p, m) bulkscan matrix); ``df``:
    chi-square degrees of freedom of the LRT (1 for a single marker effect).
    """
    pv = lod2p(np.asarray(L), df)
    qv = bh_adjust(pv, dependent=dependent)
    return qv, qv <= alpha
