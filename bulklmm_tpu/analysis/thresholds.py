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
