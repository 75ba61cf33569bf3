"""Result containers for the scan engines.

Field names mirror the reference's returned named tuples (src/scan.jl:162-193,
src/bulkscan.jl:62-84) so users migrating from BulkLMM.jl find the same
quantities: ``sigma2_e``, ``h2_null``, ``lod``, ``L_perms``, ``L``,
``h2_null_list``, ``h2_panel``, ``log10pvals`` et al.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp


@dataclasses.dataclass
class ScanResult:
    """Single-trait scan output (null or alt VC assumption)."""

    sigma2_e: jnp.ndarray
    h2_null: jnp.ndarray
    lod: jnp.ndarray  # (p,)
    h2_each_marker: Optional[jnp.ndarray] = None  # (p,), alt only
    L_perms: Optional[jnp.ndarray] = None  # (p, nperms), permutation test only
    beta: Optional[jnp.ndarray] = None  # (p,) GLS marker effects, output_effects only
    beta_se: Optional[jnp.ndarray] = None  # (p,) Wald standard errors
    log10pvals: Optional[jnp.ndarray] = None  # (p,)
    log10Pvals_perms: Optional[jnp.ndarray] = None  # (p, nperms)
    ll_list_null: Optional[jnp.ndarray] = None  # profile-LL grid values
    ll_list_alt: Optional[jnp.ndarray] = None
    h2_null_by_chrom: Optional[dict] = None  # LOCO scans: chrom -> h2
    sigma2_by_chrom: Optional[dict] = None  # LOCO scans: chrom -> sigma2_e


@dataclasses.dataclass
class BulkScanResult:
    """Multi-trait scan output."""

    L: jnp.ndarray  # (p, m) LOD matrix
    h2_null_list: Optional[jnp.ndarray] = None  # (m,) null/grid methods
    h2_panel: Optional[jnp.ndarray] = None  # (p, m) alt-grid
    beta_mat: Optional[jnp.ndarray] = None  # (p, m) GLS effects, output_effects only
    beta_se_mat: Optional[jnp.ndarray] = None  # (p, m) Wald standard errors
    log10Pvals_mat: Optional[jnp.ndarray] = None  # (p, m)
    chisq_df: Optional[int] = None
    h2_null_by_chrom: Optional[dict] = None  # LOCO scans: chrom -> (m,) h2s
