"""Pallas TPU kernels — the hand-fused perf layer.

The XLA path materializes the (p x m) GEMM outputs (B, U_k, D1) in HBM
before combining them into LOD scores; at BXD scale that is ~4 extra GB of
HBM traffic per scan. The fused kernel here computes the (c+2) MXU dots
per (marker-tile, trait-tile) block and applies the whole
project->correlate->r2lod epilogue in VMEM, writing ONLY the final LOD
matrix. Reachable directly through :func:`fused_lods_per_trait` (the
default engines stay on the XLA path, which profiling currently favors at
BXD scale — see docs/PERF.md "Pallas status").
"""

from .liteqtl_fused import fused_lods_per_trait

__all__ = ["fused_lods_per_trait"]
