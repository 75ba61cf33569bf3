"""Fused per-trait-weights correlation -> LOD Pallas kernel.

One kernel computes, for each (marker-tile i, trait-tile j) grid cell:

    B   = Xm_i^T  (W*Y)_j          \
    U_k = (Xm*C_k)_i^T  W_j         |  (c+2) MXU dots, f32 accumulation
    D1  = (Xm*Xm)_i^T  W_j         /
    Z_k = L^{-1} U   (unrolled forward substitution, per-trait vectors)
    N   = B - sum_k Z_k * zeta_k
    D   = D1 - sum_k Z_k^2
    r2  = N^2 / (D * nrm2)
    LOD = -(n/2) * log10_poly(1 - r2)

entirely in VMEM, writing only the final (p x m) LOD matrix to HBM — the XLA
path materializes the three GEMM outputs first (~4 extra GB of traffic at
BXD scale). The per-trait scalars (Cholesky factor entries, zeta, nrm2) are
tiny (c^2 x m) and are computed outside with thin GEMMs
(see ops/liteqtl.py for the math and reference citations:
reference src/bulkscan_helpers.jl:47-64, :22-24).

The trait-tile index is the *innermost* grid dimension with marker-indexed
operands constant across it, so Mosaic keeps the X blocks resident in VMEM
while streaming trait tiles.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.lod import log10_f32_accurate
from ..ops.smallchol import fwd_subst, pair_indices, residual_sq, unrolled_cholesky
from ..ops.weights import make_weights


def _kernel(xt_ref, xct_refs, xxt_ref, w_ref, wy_ref, scal_ref, out_ref, *, c, n):
    """One (marker-tile, trait-tile) cell.

    xt_ref:  (TP, n)   markers^T tile
    xct_refs: c refs, (TP, n) (markers * covar_k)^T tiles
    xxt_ref: (TP, n)   (markers^2)^T tile
    w_ref:   (n, TM)   per-trait weights tile
    wy_ref:  (n, TM)   weighted traits tile
    scal_ref:(S, TM)   per-trait scalars: rows = [Lc (c*(c+1)/2) | zeta (c) | inv_nrm2 (1)]
    out_ref: (TP, TM)  LOD tile
    """
    f32 = jnp.float32
    B = jnp.dot(xt_ref[:], wy_ref[:], preferred_element_type=f32)
    D1 = jnp.dot(xxt_ref[:], w_ref[:], preferred_element_type=f32)
    D = D1
    U = [
        jnp.dot(xct_refs[k][:], w_ref[:], preferred_element_type=f32)
        for k in range(c)
    ]

    # unpack per-trait scalars (rows of scal_ref)
    tri = {}
    row = 0
    for kk in range(c):
        for ii in range(kk, c):
            tri[(ii, kk)] = scal_ref[row, :]
            row += 1
    zeta = [scal_ref[row + k, :] for k in range(c)]
    inv_nrm2 = scal_ref[row + c, :]

    # Z = L^{-1} U by unrolled forward substitution (c is tiny & static)
    Z = []
    for kk in range(c):
        s = U[kk]
        for qq in range(kk):
            s = s - tri[(kk, qq)][None, :] * Z[qq]
        Z.append(s / tri[(kk, kk)][None, :])

    N = B
    for kk in range(c):
        N = N - Z[kk] * zeta[kk][None, :]
        D = D - Z[kk] * Z[kk]

    # Same cancellation floor as the XLA path (ops/smallchol.residual_sq):
    # D can go <= 0 for markers (near-)collinear with the covariates, which
    # would produce NaN / negative LOD. The 1-r^2 floor must stay at or above
    # f32 tiny — TPU flushes subnormals to zero and the log10 bit extraction
    # assumes a normal input. Markers whose residual collapsed to rounding
    # noise are masked to r2 = 0 exactly (relative rank test BEFORE the
    # floor). D is a difference of squares, so its noise floor is LINEAR in
    # eps (~4 eps D1, the residual_sq clamp) — cancel_keep_mask, not the
    # explicit-residual squared threshold which sits below the noise.
    from ..ops.smallchol import cancel_keep_mask

    eps = jnp.finfo(f32).eps
    keep = cancel_keep_mask(D, D1)
    D = jnp.maximum(D, 4.0 * eps * D1)
    r2 = keep * (N * N) * inv_nrm2[None, :] / D
    one_minus = jnp.maximum(1.0 - r2, jnp.finfo(f32).tiny)
    out_ref[:] = (-0.5 * n) * log10_f32_accurate(one_minus)


@functools.partial(
    jax.jit, static_argnames=("tile_p", "tile_m", "interpret")
)
def fused_lods_per_trait(
    Y0,
    X0m,
    C0,
    lam,
    h2_per_trait,
    *,
    tile_p: int = 512,
    tile_m: int = 1024,
    interpret: bool = False,
):
    """(p, m) LOD matrix with per-trait h2 — fused Pallas path (float32).

    Numerically equivalent to ``ops.liteqtl.lods_per_trait`` with
    ``FAST32``; one HBM write instead of four.
    """
    f32 = jnp.float32
    n, m = Y0.shape
    p = X0m.shape[1]
    c = C0.shape[1]

    Y = Y0.astype(f32)
    C = C0.astype(f32)
    X = X0m.astype(f32)

    W = jnp.abs(make_weights(h2_per_trait.astype(f32), lam.astype(f32))).T  # (n, m)
    WY = W * Y

    # --- thin per-trait scalar pipeline (shared ops/smallchol helpers) ---
    t = jnp.matmul(C.T, WY, precision=jax.lax.Precision.HIGHEST)  # (c, m)
    pairs = pair_indices(c)
    CC = jnp.stack([C[:, k] * C[:, l] for k, l in pairs], axis=1)  # (n, npair)
    Gv = jnp.matmul(CC.T, W, precision=jax.lax.Precision.HIGHEST)  # (npair, m)
    Gd = {kl: Gv[i] for i, kl in enumerate(pairs)}
    Lc = unrolled_cholesky(Gd, c)
    zeta = fwd_subst(Lc, [t[k] for k in range(c)], c)
    yty = jnp.sum(WY * Y, axis=0)
    nrm2 = residual_sq(yty, zeta)
    # fully covariate-explained traits -> inv_nrm2 = 0 -> r2 = 0 exactly,
    # matching the XLA kernel's mask; nrm2 is a difference of squares
    # (residual_sq) so the linear-in-eps cancel_keep_mask applies
    from ..ops.smallchol import cancel_keep_mask

    inv_nrm2 = cancel_keep_mask(nrm2, yty) / jnp.maximum(
        nrm2, jnp.finfo(f32).tiny
    )

    # rows: tri entries (col-major lower), zeta, masked 1/nrm2
    scal = jnp.stack(
        [Lc[(i, k)] for k in range(c) for i in range(k, c)]
        + zeta
        + [inv_nrm2],
        axis=0,
    )  # (S, m)

    # --- pad to tiles ---
    pp = p + (-p) % tile_p
    mm = m + (-m) % tile_m
    Xt = jnp.zeros((pp, n), dtype=f32).at[:p].set(X.T)
    XXt = Xt * Xt
    XCt = [jnp.zeros((pp, n), dtype=f32).at[:p].set((X * C[:, k][:, None]).T) for k in range(c)]
    Wp = jnp.zeros((n, mm), dtype=f32).at[:, :m].set(W)
    WYp = jnp.zeros((n, mm), dtype=f32).at[:, :m].set(WY)
    # pad scal with ones to avoid 0-division in padded trait lanes
    scal_p = jnp.ones((scal.shape[0], mm), dtype=f32).at[:, :m].set(scal.astype(f32))

    grid = (pp // tile_p, mm // tile_m)
    marker_spec = pl.BlockSpec((tile_p, n), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    trait_spec = pl.BlockSpec((n, tile_m), lambda i, j: (0, j), memory_space=pltpu.VMEM)
    scal_spec = pl.BlockSpec(
        (scal_p.shape[0], tile_m), lambda i, j: (0, j), memory_space=pltpu.VMEM
    )

    kernel = functools.partial(_wrapped_kernel, c=c, n=n)
    flops = 2 * (c + 2) * pp * n * mm
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((pp, mm), f32),
        grid=grid,
        in_specs=[marker_spec] + [marker_spec] * c + [marker_spec, trait_spec, trait_spec, scal_spec],
        out_specs=pl.BlockSpec(
            (tile_p, tile_m), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (pp * n * (c + 2) + 2 * n * mm + pp * mm),
            transcendentals=pp * mm,
        ),
        interpret=interpret,
    )(Xt, *XCt, XXt, Wp, WYp, scal_p)
    return out[:p, :m]


def _wrapped_kernel(*refs, c, n):
    xt = refs[0]
    xct = refs[1 : 1 + c]
    xxt, w, wy, scal, out = refs[1 + c :]
    _kernel(xt, xct, xxt, w, wy, scal, out, c=c, n=n)
