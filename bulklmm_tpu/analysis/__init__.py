"""Post-scan analysis: thresholds, profile likelihood, FDR."""

from .fdr import bh_adjust, lod_fdr
from .profile_ll import ProfileLL, getLL, profile_LL
from .thresholds import Thresholds, get_thresholds, get_thresholds_bulk

__all__ = [
    "ProfileLL",
    "getLL",
    "profile_LL",
    "Thresholds",
    "get_thresholds",
    "get_thresholds_bulk",
    "bh_adjust",
    "lod_fdr",
]
