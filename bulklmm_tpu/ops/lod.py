"""LOD-score conversions.

- ``r2lod``: correlation -> LOD, the elementwise map applied to the big
  correlation GEMM output (reference src/bulkscan_helpers.jl:22-24). Pure jnp,
  fused by XLA into the surrounding computation.
- ``p2lod`` / ``lod2p`` / ``lod2log10p``: chi-square LRT <-> p-value
  conversions (reference src/util.jl:181-206). These are result
  post-processing; the host variants use scipy for full tail accuracy, and
  ``lod2log10p_device`` is a jnp variant usable inside jit.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np
from jax.scipy.special import gammaincc

_LN10 = math.log(10.0)


def r2lod(r, n):
    """LOD = -(n/2) * log10(1 - r^2) for correlation r and sample size n."""
    return -(n / 2.0) * jnp.log10(1.0 - r * r)


def rss2lod(rss1, rss0, n):
    """LOD from null/alt residual sums of squares: (n/2) log10(rss0/rss1).

    Equivalent to the reference's per-marker formula
    ``(-n/2)(log10 rss1 - log10 rss0)`` (src/scan.jl:449).
    """
    return (n / 2.0) * (jnp.log10(rss0) - jnp.log10(rss1))


def p2lod(pval, df: int):
    """p-value -> LOD: inverse chi-square CDF of (1 - p), over 2 ln10 (host)."""
    from scipy.stats import chi2

    lrs = chi2.isf(np.asarray(pval), df)
    return lrs / (2.0 * _LN10)


def lod2p(lod, df: int):
    """LOD -> p-value: chi-square survival function of LOD * 2 ln10 (host)."""
    from scipy.stats import chi2

    lrs = np.asarray(lod) * 2.0 * _LN10
    return chi2.sf(lrs, df)


def lod2log10p(lod, df: int):
    """LOD -> -log10(p-value), accurate deep into the tail (host, scipy)."""
    from scipy.stats import chi2

    lrs = np.asarray(lod) * 2.0 * _LN10
    return -chi2.logsf(lrs, df) / _LN10


def lod2log10p_device(lod, df: int):
    """LOD -> -log10(p) with jnp (jit-safe). Accurate for moderate LODs;
    for very large LODs (p underflowing float64) prefer the host variant."""
    lrs = lod * 2.0 * _LN10
    sf = gammaincc(df / 2.0, lrs / 2.0)
    sf = jnp.maximum(sf, jnp.finfo(jnp.asarray(lod).dtype).tiny)
    return -jnp.log10(sf)
