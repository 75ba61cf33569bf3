"""Pallas TPU kernels — the hand-fused perf layer.

- :func:`fused_alt_grid` — the alt-grid engine's TPU fast path: the h2-grid
  loop runs inside one kernel with the (p, m) running-max/argmax carry held
  in VMEM across grid steps (the XLA ``lax.scan`` formulation round-trips
  ~1 GB of carry through HBM per step at BXD scale). Auto-selected by
  ``bulkscan(..., method="alt-grid")`` on TPU; also selectable explicitly
  with ``engine="pallas"``.
- :func:`fused_lods_per_trait` — fused per-trait-weights correlation->LOD
  kernel. The null engines stay on the XLA path, which profiling currently
  favors at BXD scale (docs/PERF.md "Pallas status"); reachable directly.
"""

from .altgrid_fused import fused_alt_grid
from .liteqtl_fused import fused_lods_per_trait

__all__ = ["fused_alt_grid", "fused_lods_per_trait"]
