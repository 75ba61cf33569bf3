"""Permutation-based family-wise-error LOD thresholds.

Parity: reference ``get_thresholds``
(src/analysis_helpers/single_trait_analysis.jl:13-23): per-permutation max
LOD across markers, thresholds = quantiles of the maxima at 1 - alpha.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np


class Thresholds(NamedTuple):
    probs: np.ndarray
    thrs: np.ndarray


def get_thresholds(L, signif_level: Sequence[float]) -> Thresholds:
    """Thresholds from a (p, nperms) permutation LOD matrix.

    ``signif_level``: right-tail significance levels (e.g. [0.10, 0.05]).
    Quantiles use the same definition as Julia's ``quantile`` (linear
    interpolation, type-7), which is numpy's default.
    """
    peaks = np.asarray(jnp.max(jnp.asarray(L), axis=0))
    probs = 1.0 - np.asarray(signif_level, dtype=np.float64)
    thrs = np.quantile(peaks, probs)
    return Thresholds(probs=probs, thrs=thrs)


def get_thresholds_bulk(perm_maxima, signif_level: Sequence[float]) -> Thresholds:
    """Per-trait thresholds from (m, nperms) genome-wide permutation maxima.

    ``perm_maxima``: :attr:`bulklmm_tpu.BulkPermResult.perm_maxima` (each row
    is one trait's null max-LOD replicates — the per-marker max is already
    taken by the bulk engine). Returns ``thrs`` with shape
    (len(signif_level), m): same type-7 quantiles as :func:`get_thresholds`,
    row l = the level-l threshold for every trait.

    The quantile reduction runs on device (``jnp.quantile``'s "linear"
    method == numpy default == Julia type-7): at BXD scale ``perm_maxima``
    is ~140 MB and stays device-resident (see ``BulkPermResult``); only the
    (levels x m) threshold matrix is fetched.
    """
    peaks = jnp.asarray(perm_maxima)
    probs = 1.0 - np.asarray(signif_level, dtype=np.float64)
    thrs = jnp.quantile(peaks, jnp.asarray(probs, dtype=peaks.dtype), axis=1)
    return Thresholds(probs=probs, thrs=np.asarray(thrs, dtype=np.float64))
