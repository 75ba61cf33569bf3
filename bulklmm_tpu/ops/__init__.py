"""Numerical primitives (pure jnp, jit/vmap-friendly)."""

from .brent import brent_min, gridbrent
from .kinship import calc_kinship, calc_kinship_sharded
from .liteqtl import (
    lods_per_trait,
    lods_shared,
    weighted_correlation_per_trait,
    weighted_correlation_shared,
)
from .lmm import LMMResult, fit_lmm
from .lowrank import (
    LowRankKinship,
    kinship_lowrank,
    kinship_lowrank_exact,
    kinship_lowrank_from_geno,
)
from .lod import lod2log10p, lod2log10p_device, lod2p, p2lod, r2lod, rss2lod
from .rotation import (
    KinshipDecomposition,
    decompose_kinship,
)
from .rotation import (
    RotatedData,
    ReweightedData,
    kinship_eigen,
    transform_permute,
    transform_reweight,
    transform_rotation,
)
from .stats import (
    col_center,
    col_divide,
    col_standardize,
    row_center,
    row_divide,
    row_multiply,
    shuffle_vector,
)
from .weights import make_weights
from .wls import wls_ell
from .wls import WLSResult, resid, rss, wls, wls_multivar

__all__ = [
    "KinshipDecomposition",
    "decompose_kinship",
    "wls_ell",
    "brent_min",
    "gridbrent",
    "calc_kinship",
    "calc_kinship_sharded",
    "lods_per_trait",
    "lods_shared",
    "weighted_correlation_per_trait",
    "weighted_correlation_shared",
    "LMMResult",
    "fit_lmm",
    "lod2log10p",
    "lod2log10p_device",
    "lod2p",
    "p2lod",
    "r2lod",
    "rss2lod",
    "RotatedData",
    "ReweightedData",
    "kinship_eigen",
    "transform_permute",
    "transform_reweight",
    "transform_rotation",
    "col_center",
    "col_divide",
    "col_standardize",
    "row_center",
    "row_divide",
    "row_multiply",
    "shuffle_vector",
    "make_weights",
    "WLSResult",
    "resid",
    "rss",
    "wls",
    "wls_multivar",
]
