"""Unrolled small-Cholesky helpers for covariate-sized (c x c) systems.

c (intercept + covariates) is tiny and static, so the factorization and
substitutions unroll into c^2-ish fused elementwise ops over arbitrarily
batched operands — no ``jnp.linalg`` primitive. Batched (m, c, c) LU/inv
lane-pads catastrophically on TPU (measured ~10x the surrounding GEMMs) and
batched Householder QR cost ~30x in the Brent likelihood loops; this module
is the single home for the pattern shared by ``ops.wls.wls_ell``,
``ops.liteqtl`` and the fused Pallas kernel.

Entries are keyed dicts: ``G[(k, l)]`` for k <= l holds the (k, l) Gram
entry as an array broadcastable against the substitution right-hand sides.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax.numpy as jnp


def pair_indices(c: int) -> List[Tuple[int, int]]:
    """Upper-triangular (k, l), k <= l, ordering for Gram entries."""
    return [(k, l) for k in range(c) for l in range(k, c)]


def unrolled_cholesky(G: Dict[Tuple[int, int], jnp.ndarray], c: int):
    """Lower-triangular factor entries ``L[(i, k)]`` of G = L L^T."""
    L: Dict[Tuple[int, int], jnp.ndarray] = {}
    for k in range(c):
        s = G[(k, k)]
        for q in range(k):
            s = s - L[(k, q)] * L[(k, q)]
        L[(k, k)] = jnp.sqrt(s)
        for i in range(k + 1, c):
            s = G[(k, i)] if (k, i) in G else G[(i, k)]
            for q in range(k):
                s = s - L[(i, q)] * L[(k, q)]
            L[(i, k)] = s / L[(k, k)]
    return L


def fwd_subst(L, rows: Sequence[jnp.ndarray], c: int) -> List[jnp.ndarray]:
    """Solve ``L z = rows`` by forward substitution; rows may be any shapes
    broadcastable against the factor entries (e.g. (m,) scalars-per-trait or
    (p, m) marker blocks)."""
    z: List[jnp.ndarray] = []
    for k in range(c):
        s = rows[k]
        for q in range(k):
            s = s - L[(k, q)] * z[q]
        z.append(s / L[(k, k)])
    return z


def residual_sq(total_sq: jnp.ndarray, zeta: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """``||r||^2 = total_sq - sum zeta_k^2`` with a cancellation floor.

    The normal-equations identity can cancel slightly negative under f32 for
    inputs nearly collinear with the covariates (the reference's explicit
    residualization is nonnegative by construction); clamp at a tiny
    positive multiple of the total so downstream sqrt/log never produce NaN
    — a genuinely collinear input then yields |r| -> 1 (huge LOD), matching
    the reference's degenerate behavior rather than poisoning the row.
    """
    out = total_sq
    for zk in zeta:
        out = out - zk * zk
    eps = jnp.finfo(out.dtype).eps
    return jnp.maximum(out, 4.0 * eps * total_sq)
