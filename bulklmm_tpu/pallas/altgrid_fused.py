"""Fused alt-grid (grid-approximated Exact-LMM) Pallas kernel.

Reference semantics: ``bulkscan_alt_grid`` evaluates, for every
(marker, trait) pair, the alternative-model log-likelihood at each h2 grid
point and keeps the max (reference src/bulkscan.jl:428-527; its ``tmax!``
counter bug — h2_panel picking ``hsq_list[count]`` instead of the argmax —
is fixed here, as in models/bulkscan.py).

Why a kernel: the XLA formulation (``lax.scan`` over grid points in
models/bulkscan.py::_alt_grid_impl) must round-trip the (p, m) running-max
and argmax carries through HBM on EVERY grid step — at BXD scale
(7,321 x 35,554) that is ~1 GB of carry per step, ~30 GB of pure carry
traffic for a 10-point grid, and it made alt-grid the one engine ~3x slower
than null-grid. Here the carry lives in VMEM: the Pallas grid is
(marker-tile i, trait-tile j, grid-step k) with k innermost and the output
BlockSpec ignoring k, so Mosaic keeps each (TP, TM) output tile resident
across all grid steps and writes it to HBM exactly once.

Two further structural wins:

1. **No transcendentals in the loop.** Maximizing
   ``logL1_k = -(n/2) ln(1 - r_k^2) + ell0_k`` over k is equivalent to
   minimizing ``u_k = (1 - r_k^2) * exp(-(2/n)(ell0_k - max_k ell0_k))``
   (a monotone transform; the per-(grid, trait) factors are computed once
   outside the kernel at (g, m) scale). The kernel's inner loop is one MXU
   dot plus an elementwise multiply/compare; the single log10 per output
   element runs once, on the final grid step:
   ``LOD = -(n/2) log10(min_k u_k)`` (== (max_k logL1 - max_k ell0)/ln10).
2. **No stacked per-grid operands.** The marker block (TP, n) and trait
   block (n, TM) BlockSpecs ignore k, so they too stay VMEM-resident across
   grid steps; the per-step weighting + covariate-residualization
   (sqrt-weight scale, project out the weighted-covariate orthobasis Q_k,
   cancel the norms) is recomputed in VMEM from (n,)-scale inputs — a few
   thin dots, negligible next to the (TP, n)(n, TM) correlation dot. Input
   HBM traffic is therefore independent of the grid size g.

All dots run at ``Precision.HIGHEST`` (bf16x6 — Mosaic's default f32 dot is
single-pass bf16, measured 1.3e-3 on correlation operands vs 6.7e-8 for
HIGHEST, far outside the 1e-5 parity bar).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.lod import log10_f32_accurate
from ..ops.smallchol import residual_keep_mask
from ..ops.weights import make_weights

_HI = jax.lax.Precision.HIGHEST


def _kernel(s_ref, qt_ref, xt_ref, y_ref, c_ref, u_ref, kmax_ref=None, *,
            n, g, dot_precision=_HI):
    """One (marker-tile, trait-tile, grid-step) cell.

    s_ref:    (1, 1, n_pad) sqrt-weights for grid step k
    qt_ref:   (1, c, n_pad) weighted-covariate orthobasis Q_k^T
    xt_ref:   (TP, n_pad)   markers^T tile (constant across j, k)
    y_ref:    (n_pad, TM)   traits tile (constant across k)
    c_ref:    (1, 1, TM)    exp(-(2/n)(ell0[k] - ell0max)) per trait
    u_ref:    (TP, TM)      running min of u (VMEM-resident across k);
                            becomes the LOD tile on the last step
    kmax_ref: (TP, TM) int8 running argmin grid index, or None
              (``output_h2_panel=False``: min-only carry, measured 1.095x
              — benchmarks/probe_altgrid_argmax.py)
    """
    k = pl.program_id(2)
    tiny = jnp.finfo(jnp.float32).tiny
    s = s_ref[0, 0, :]
    Qt = qt_ref[0]

    # Weight + residualize both operands against Q_k in VMEM. Padded rows of
    # Xt/Y and padded lanes of s/Qt are zero, so they drop out of every dot.
    Xw = xt_ref[:] * s[None, :]  # (TP, n_pad)
    pX = jax.lax.dot_general(Xw, Qt, (((1,), (1,)), ((), ())), precision=_HI)
    Xr = Xw - jax.lax.dot_general(pX, Qt, (((1,), (0,)), ((), ())), precision=_HI)
    xn = jnp.sum(Xr * Xr, axis=1, keepdims=True)  # (TP, 1)

    Yw = y_ref[:] * s[:, None]  # (n_pad, TM)
    pY = jax.lax.dot_general(Qt, Yw, (((1,), (0,)), ((), ())), precision=_HI)
    Yr = Yw - jax.lax.dot_general(Qt, pY, (((0,), (0,)), ((), ())), precision=_HI)
    yn = jnp.sum(Yr * Yr, axis=0, keepdims=True)  # (1, TM)

    dims = (((1,), (0,)), ((), ()))
    if dot_precision == jax.lax.Precision.HIGH:
        # Mosaic has no Precision.HIGH lowering — emulate bf16x3 with
        # manual bf16 hi/lo splits of the residualized operands and three
        # single-pass dots (f32 accumulation): the THROUGHPUT screening
        # tier (~1e-3 LOD). The thin residualization dots above stay
        # HIGHEST — they are c-wide and cost nothing next to this one.
        bf16 = jnp.bfloat16
        Xh = Xr.astype(bf16)
        Xl = (Xr - Xh.astype(jnp.float32)).astype(bf16)
        Yh = Yr.astype(bf16)
        Yl = (Yr - Yh.astype(jnp.float32)).astype(bf16)
        # precision pinned to DEFAULT: these dots run under the callers'
        # with_highest_matmul context, and HIGHEST on bf16 operands is a
        # Mosaic type error ("Bad lhs type" — fp32 contract precision on
        # a bf16 matmul); single-pass is exactly what the splits want
        lo = jax.lax.Precision.DEFAULT
        num = (
            jax.lax.dot_general(Xh, Yh, dims, precision=lo,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(Xh, Yl, dims, precision=lo,
                                  preferred_element_type=jnp.float32)
            + jax.lax.dot_general(Xl, Yh, dims, precision=lo,
                                  preferred_element_type=jnp.float32)
        )
    else:
        num = jax.lax.dot_general(Xr, Yr, dims, precision=dot_precision)
    # covariate-collinear markers / fully-explained traits residualize to
    # rounding noise — the relative rank mask maps them to r2 = 0 exactly,
    # matching the XLA engine (the helpers are pure jnp, fine in-kernel;
    # explicit residuals -> the squared-threshold residual_keep_mask)
    keep = residual_keep_mask(
        xn, jnp.sum(Xw * Xw, axis=1, keepdims=True)
    ) * residual_keep_mask(yn, jnp.sum(Yw * Yw, axis=0, keepdims=True))
    r2 = keep * (num * num) / jnp.maximum(xn * yn, tiny)
    # same cancellation floor as the XLA path: r2 can round to >= 1 for
    # markers perfectly correlated with a trait; TPU flushes subnormals to
    # zero and log10_f32_accurate needs a normal input
    u = jnp.maximum(jnp.maximum(1.0 - r2, tiny) * c_ref[0, 0, :][None, :], tiny)

    if kmax_ref is None:
        @pl.when(k == 0)
        def _():
            u_ref[:] = u

        @pl.when(k > 0)
        def _():
            u_ref[:] = jnp.minimum(u_ref[:], u)
    else:
        @pl.when(k == 0)
        def _():
            u_ref[:] = u
            kmax_ref[:] = jnp.zeros_like(kmax_ref)

        @pl.when(k > 0)
        def _():
            upd = u < u_ref[:]  # strict: first min wins, like Julia findmax
            kmax_ref[:] = jnp.where(upd, k.astype(jnp.int8), kmax_ref[:])
            u_ref[:] = jnp.where(upd, u, u_ref[:])

    @pl.when(k == g - 1)
    def _():
        u_ref[:] = (-0.5 * n) * log10_f32_accurate(u_ref[:])


def _pad_to(x, rows, cols):
    out = jnp.zeros((rows, cols), dtype=x.dtype)
    return out.at[: x.shape[0], : x.shape[1]].set(x)


def fused_alt_grid_feasible(
    n: int, tile_p: int = 512, tile_m: int = 1024,
    budget_bytes: int = 80 * 1024 * 1024,
) -> bool:
    """Whether the fused alt-grid kernel fits VMEM at this sample count.

    The kernel's VMEM-resident blocks scale linearly in n — the
    (tile_p, n) marker tile and the (n, tile_m) trait tile, both
    double-buffered — so past n ~ 6-8k at the default tiles they exceed
    the 100 MB scoped limit. Callers must then use the XLA ``lax.scan``
    formulation ("auto" engine selection checks this; explicit
    engine='pallas' raises a clear error instead of a Mosaic compile
    failure)."""
    n_pad = n + (-n) % 8
    return 2 * 4 * n_pad * (tile_p + tile_m) <= budget_bytes


def fused_alt_grid(
    Y0,
    X0m,
    C0,
    lam,
    h2_grid,
    *,
    prior,
    reml: bool = False,
    tile_p: int = 512,
    tile_m: int = 1024,
    dot_precision=_HI,
    interpret: bool = False,
    output_h2_panel: bool = True,
):
    """(p, m) alt-grid LOD matrix + (p, m) argmax h2 panel, fused.
    ``output_h2_panel=False`` drops the int8 argmax carry from the VMEM
    loop (returns ``(L, None)``) — measured 1.095x at BXD scale
    (benchmarks/probe_altgrid_argmax.py; a deferred second argmax pass
    would cost a full re-sweep, strictly worse than carrying).

    Y0/X0m/C0/lam: eigen-rotated traits (n, m), markers (n, p), covariates
    (n, c), eigenvalues (n,). Numerics match ``_alt_grid_impl`` with a
    float32 kernel dtype (BALANCED/FAST32); the per-(grid, trait) null
    likelihoods ``ell0`` are evaluated at the input dtype outside the
    kernel. Composable under jit; call via models/bulkscan.py
    (``bulkscan(..., method="alt-grid")`` auto-selects this on TPU).
    """
    from ..models.bulkscan import grid_null_ell

    f32 = jnp.float32
    n, m = Y0.shape
    p = X0m.shape[1]
    c = C0.shape[1]
    g = int(h2_grid.shape[0])
    if g > 127:
        raise ValueError("h2 grid larger than 127 points (int8 argmax carry)")

    # (g, m) null log-likelihoods at the solve dtype (f64 under BALANCED),
    # exactly as the XLA path evaluates them
    ells = grid_null_ell(Y0, C0, lam, h2_grid, prior, reml=reml)
    ell0max = jnp.max(ells, axis=0)  # (m,)
    cmat = jnp.exp(-(2.0 / n) * (ells - ell0max[None, :])).astype(f32)

    # per-grid sqrt-weights + weighted-covariate orthobasis (tiny; computed
    # at the input dtype, cast f32 for the kernel)
    W = jnp.abs(make_weights(h2_grid, lam))  # (g, n)
    S = jnp.sqrt(W)
    Cw = C0[None, :, :] * S[:, :, None]  # (g, n, c)
    Q = jnp.linalg.qr(Cw, mode="reduced")[0]  # (g, n, c)

    n_pad = n + (-n) % 8
    p_pad = p + (-p) % tile_p
    m_pad = m + (-m) % tile_m

    # leading singleton axes keep the (sublane, lane) block dims legal:
    # Mosaic requires the last two block dims divisible by (8, 128) or equal
    # to the array dims
    Xt = _pad_to(X0m.T.astype(f32), p_pad, n_pad)
    Yp = _pad_to(Y0.astype(f32), n_pad, m_pad)
    Sp = _pad_to(S.astype(f32), g, n_pad).reshape(g, 1, n_pad)
    Qt = jnp.zeros((g, c, n_pad), dtype=f32).at[:, :, :n].set(
        jnp.swapaxes(Q, 1, 2).astype(f32)
    )
    # padded trait lanes get factor 1 -> u = 1, sliced off below
    cp = jnp.ones((g, m_pad), dtype=f32).at[:, :m].set(cmat).reshape(g, 1, m_pad)

    grid = (p_pad // tile_p, m_pad // tile_m, g)
    kernel = functools.partial(_kernel, n=n, g=g, dot_precision=dot_precision)
    # index-map zeros are derived from the i32 grid indices (j * 0, not the
    # literal 0): with jax x64 enabled a literal traces as i64 and Mosaic
    # rejects the mixed i32/i64 index tuple
    out_spec = pl.BlockSpec(
        (tile_p, tile_m), lambda i, j, k: (i, j), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        out_shape=(
            (
                jax.ShapeDtypeStruct((p_pad, m_pad), f32),
                jax.ShapeDtypeStruct((p_pad, m_pad), jnp.int8),
            )
            if output_h2_panel
            else jax.ShapeDtypeStruct((p_pad, m_pad), f32)
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, n_pad), lambda i, j, k: (k, i * 0, i * 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, c, n_pad), lambda i, j, k: (k, i * 0, i * 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tile_p, n_pad), lambda i, j, k: (i, j * 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (n_pad, tile_m), lambda i, j, k: (i * 0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, tile_m), lambda i, j, k: (k, i * 0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(out_spec, out_spec) if output_h2_panel else out_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            # 6 bf16 passes at HIGHEST (3 at the emulated HIGH) on the
            # main dot
            flops=(6 if dot_precision == _HI else 3)
            * 2 * p_pad * n_pad * m_pad * g,
            bytes_accessed=4 * (p_pad * n_pad + n_pad * m_pad + 2 * p_pad * m_pad),
            transcendentals=p_pad * m_pad,
        ),
        interpret=interpret,
    )(Sp, Qt, Xt, Yp, cp)

    if not output_h2_panel:
        return out[:p, :m].astype(Y0.dtype), None
    L, kmax = out
    L = L[:p, :m].astype(Y0.dtype)
    h2_panel = h2_grid[kmax[:p, :m].astype(jnp.int32)]
    return L, h2_panel
