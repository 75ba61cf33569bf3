"""Precision / numerics configuration for the TPU-native LMM engine.

The reference (BulkLMM.jl) is float64 end-to-end on CPU BLAS. On TPU, float64
is emulated and slow, so the engine splits precision into two knobs:

- ``solve_dtype``: dtype for the scalar-heavy path (weights, likelihoods,
  per-trait/marker WLS solves, Brent iterations). float64 on CPU tests gives
  bit-comparable parity with the reference formulas; float32 on TPU is fast.
- ``gemm_dtype`` + ``gemm_precision``: dtype/precision of the large
  trait x marker correlation GEMMs (the throughput core). float32 with
  ``Precision.HIGHEST`` uses the MXU's highest-accuracy f32 path.

There is no config-file / env-var system in the reference (everything is
keyword arguments; see reference src/scan.jl:94-109); we mirror that with a
small frozen dataclass passed as a keyword.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp


def with_highest_matmul(fn):
    """Scope ``jax.default_matmul_precision('highest')`` around ``fn``.

    Statistical numerics first: TPU matmuls default to bf16 operands, which
    costs ~1e-2 absolute LOD error through the likelihood path — including
    inside primitives that take no precision argument (``jnp.linalg.qr``'s
    internal matmuls). Every engine entry point wraps its math in this
    context instead of mutating process-global JAX config at import time
    (which would silently change the numerics/performance of unrelated user
    code in the same process). The big correlation GEMMs still take their
    precision explicitly from PrecisionConfig.
    """

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapper


def default_float() -> Any:
    """float64 when jax x64 is enabled, else float32."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


@dataclasses.dataclass(frozen=True)
class PrecisionConfig:
    """Numerics knobs for the scan engines.

    Attributes:
      solve_dtype: dtype for likelihood / WLS / optimizer math. ``None``
        resolves to float64 if x64 is enabled, else float32.
      gemm_dtype: dtype for the big correlation GEMMs. ``None`` resolves to
        ``solve_dtype``.
      gemm_precision: ``jax.lax.Precision`` for those GEMMs.
    """

    solve_dtype: Optional[Any] = None
    gemm_dtype: Optional[Any] = None
    gemm_precision: jax.lax.Precision = jax.lax.Precision.HIGHEST
    kernel_dtype: Optional[Any] = None  # correlation-kernel combine dtype

    def resolve_solve(self) -> Any:
        return self.solve_dtype if self.solve_dtype is not None else default_float()

    def resolve_gemm(self) -> Any:
        return self.gemm_dtype if self.gemm_dtype is not None else self.resolve_solve()

    def resolve_kernel(self) -> Any:
        """Dtype for the (p x m)-scale combining inside the correlation
        kernel; defaults to the solve dtype. The BALANCED preset keeps the
        cheap rotation/likelihood math in f64 but the big combines in f32."""
        return self.kernel_dtype if self.kernel_dtype is not None else self.resolve_solve()


DEFAULT_PRECISION = PrecisionConfig()

# Presets (TPU guidance; require jax x64 for the float64 members):
#   FAST32  — everything f32, GEMMs at HIGHEST (bf16x6). ~1e-3 absolute LOD
#             accuracy at BXD scale; the throughput mode.
#   MIXED   — f64 likelihood/combining math, f32 HIGHEST GEMMs. Accuracy set
#             by the GEMM rounding alone.
#   EXACT64 — f64 end-to-end (emulated on TPU). Bit-level agreement with the
#             reference formulas (~1e-13 LOD); still faster than the
#             reference's CPU baseline at BXD scale.
FAST32 = PrecisionConfig(solve_dtype=jnp.float32, gemm_dtype=jnp.float32)
MIXED = PrecisionConfig(solve_dtype=jnp.float64, gemm_dtype=jnp.float32)
EXACT64 = PrecisionConfig(solve_dtype=jnp.float64, gemm_dtype=jnp.float64)
# BALANCED: f64 rotation + likelihood/grid math (small arrays), f32 GEMMs
# AND f32 kernel combines (the (p x m)-scale traffic) — measured ~9e-6 max
# LOD error at near-FAST32 speed.
BALANCED = PrecisionConfig(
    solve_dtype=jnp.float64, gemm_dtype=jnp.float32, kernel_dtype=jnp.float32
)
# THROUGHPUT: like FAST32 but GEMMs at Precision.HIGH (bf16x3 instead of
# bf16x6; the fused Pallas kernels emulate it with manual bf16 splits —
# Mosaic has no HIGH lowering). Measured (round 4, v5e): 2.0x on the
# MXU-pass-bound bulk-perm kernel (BXD 35,554 x 1,000 sweep 2.36 -> 1.30 s
# at 3.6e-3 max |dLOD|), 1.44-1.61x on FLOP-bound large-n cohorts
# (biobank bulkscan 0.164 -> 0.114 s; 5000 x 100k x 20k 3.60 -> 2.24 s)
# at ~4e-3 absolute LOD accuracy. Screening-grade: rank candidate loci
# fast, confirm peaks with BALANCED/EXACT64.
THROUGHPUT = PrecisionConfig(
    solve_dtype=jnp.float32,
    gemm_dtype=jnp.float32,
    gemm_precision=jax.lax.Precision.HIGH,
)


def enable_x64() -> None:
    """Enable float64 globally (call before creating arrays)."""
    jax.config.update("jax_enable_x64", True)
