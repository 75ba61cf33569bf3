"""Fused bulk-permutation Pallas kernel: genome-wide permutation maxima for
a block of traits without materializing any (markers x traits x perms) LODs.

Reference semantics: per trait, ``scan_perms_lite``'s hot GEMM + per-column
max (src/scan.jl:534-543 + src/analysis_helpers/single_trait_analysis.jl:15)
— here for every trait at once (ops/bulkperm.py derives the batching
identities).

Why a kernel: the full (p, m, nperms) correlation tensor at BXD scale is
7,321 x 35,554 x 1,024 ~ 1 TB — it cannot touch HBM. What the user needs is
only its max over markers. The Pallas grid is (trait-row-block, marker-tile)
with the marker axis innermost: each 8-trait program's (8, K) running-max
carry lives in the revisited output block (its index map ignores the marker
index, so Mosaic keeps it VMEM-resident across all marker tiles and writes
HBM exactly once), while the rotated marker panel streams through VMEM one
(tile_p, n) tile at a time — panels far larger than VMEM (biobank n x p)
stream fine.

Round-4 redesign (v2): the kernel is now a PURE num-dot + masked running
max. The round-3 kernel re-derived each trait's weighted, covariate-
residualized marker tile in VMEM (two c-wide MXU dots per (trait, tile)
whose output lanes pad c -> 128, ~25% of all MXU passes). The self-adjoint
projector identity moves that work to the (n,)-scale trait side, where it
is done ONCE per trait instead of once per (trait, marker tile):

    <(I-P_t)(X ⊙ sw_t), s_k> = <X, sw_t ⊙ (I-P_t) s_k>

so the XLA prep hands the kernel ``S2[t] = sw_t ⊙ (I-P_t) S_t`` (the
shuffled unit residuals, covariate-residualized and weight-folded) and
``inv_xn[t, i] = keep / ||(I-P_t)(x_i ⊙ sw_t)||^2`` (from the XLA engine's
own ``perm_trait_marker_parts`` — the degenerate-marker mask arrives as
inv_xn = 0 exactly, COMPAT.md #15). Per (trait, tile) the kernel runs ONE
MXU dot ``X_tile @ S2[t]`` and a VPU ``max(num^2 * inv_xn)``.

What bounds it (benchmarks/probe_perm_kernel.py, docs/PERF.md round-4):
the num dot contracts over n = 79 SAMPLES — padded to the MXU's 128
contraction quantum, so per-pass efficiency caps at n/128 = 62%, and f32
HIGHEST costs 6 bf16 passes. The round-3 "HBM-bound on the pre-shuffled
residual" hypothesis is refuted by arithmetic: the full Sperm round-trip
is ~23 GB ~ 30 ms at HBM rate, while the num dot alone is ~42 nominal
TFLOP ~ 2.4 s at the padded-contraction ceiling. The in-kernel shuffle
(VERDICT r3 task 1) therefore cannot help — the shuffle's bytes were
never the wall — and is closed as measured-negative; v2 instead removes
the only removable MXU passes. All dots run at ``precision.gemm_precision``
(HIGHEST by default: Mosaic's default f32 dot is single-pass bf16, ~1e-3
relative, far outside the 1e-5 parity bar; THROUGHPUT's bf16x3 is the
documented screening tier).

The kernel emits max r^2; the (tiny) monotone LOD transform runs outside
(ops/bulkperm.py::maxr2_to_lod semantics, fused by XLA into the consumer).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.lod import log10_f32_accurate

_HI = jax.lax.Precision.HIGHEST

_TM = 8  # traits per program (sublane quantum of the output block)


def _kernel(s_ref, x_ref, ixn_ref, o_ref, *, k_pad, dot_precision):
    """One program = 8 traits x all perms x ONE marker tile.

    s_ref:   (TM, n_pad, k_pad) weight-folded, covariate-residualized
             shuffled unit residuals  sw_t ⊙ (I-P_t) S_t
    x_ref:   (tile_p, n_pad)    this marker tile, transposed (RAW rotated
                                markers — shared across all traits)
    ixn_ref: (TM, tile_p)       per-(trait, marker) 1/||residualized
                                weighted marker||^2, 0 where masked
    o_ref:   (TM, k_pad)        running max r^2 per (trait, perm) —
                                revisited across marker tiles (index map
                                ignores the marker grid index)
    """
    Xt = x_ref[:]  # (TP, n_pad)
    three_pass = dot_precision == jax.lax.Precision.HIGH
    if three_pass:
        # Mosaic has no Precision.HIGH lowering — emulate XLA's bf16x3
        # (hh + hl + lh; drops the ~2^-16-relative ll term) with manual
        # bf16 splits and three single-pass dots accumulated in f32.
        # X splits once per tile, shared by all 8 traits.
        bf16 = jnp.bfloat16
        Xh = Xt.astype(bf16)
        Xl = (Xt - Xh.astype(jnp.float32)).astype(bf16)
    rows = []
    for t in range(_TM):
        if three_pass:
            St = s_ref[t]
            Sh = St.astype(jnp.bfloat16)
            Sl = (St - Sh.astype(jnp.float32)).astype(jnp.bfloat16)
            dims = (((1,), (0,)), ((), ()))
            # precision pinned to DEFAULT: under a with_highest_matmul
            # caller context the inherited HIGHEST on bf16 operands is a
            # Mosaic type error ("Bad lhs type"); single-pass is exactly
            # what the splits want
            lo = jax.lax.Precision.DEFAULT
            num = (
                jax.lax.dot_general(Xh, Sh, dims, precision=lo,
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(Xh, Sl, dims, precision=lo,
                                      preferred_element_type=jnp.float32)
                + jax.lax.dot_general(Xl, Sh, dims, precision=lo,
                                      preferred_element_type=jnp.float32)
            )
        else:
            num = jax.lax.dot_general(
                Xt, s_ref[t], (((1,), (0,)), ((), ())),
                precision=dot_precision,
            )  # (TP, k_pad)
        # padded marker rows are all-zero AND their inv_xn is 0 -> r2 = 0;
        # degenerate (monomorphic / covariate-collinear) markers arrive
        # with inv_xn = 0 exactly (COMPAT.md #15)
        r2 = (num * num) * ixn_ref[t, :][:, None]
        rows.append(jnp.max(r2, axis=0, keepdims=True))
    new = jnp.concatenate(rows, axis=0)  # (TM, k_pad)

    pi = pl.program_id(1)

    @pl.when(pi == 0)
    def _init():
        o_ref[:] = new

    @pl.when(pi != 0)
    def _accum():
        o_ref[:] = jnp.maximum(o_ref[:], new)


def _pad_axis(x, axis, size):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, size - x.shape[axis])
    return jnp.pad(x, pad)


def fused_perm_maxlods(
    X0m,
    S2,
    inv_xn,
    *,
    n: int,
    tile_p: int = 256,
    dot_precision=_HI,
    interpret: bool = False,
):
    """(mb, K) genome-wide max LODs for a block of traits.

    X0m: (n, p) rotated markers; S2: (mb, n, K) weight-folded,
    covariate-residualized shuffled unit residuals
    ``sw_t ⊙ (I-P_t) S_t`` (see :func:`fused_perm_prep`); inv_xn: (mb, p)
    reciprocal residualized-weighted-marker norms, 0 where the
    degenerate-marker mask fired. ``n`` is the true sample count (LOD
    factor). f32 kernel; composable under jit.
    """
    f32 = jnp.float32
    mb = S2.shape[0]
    p = X0m.shape[1]
    K = S2.shape[2]
    if mb % _TM:
        raise ValueError(f"trait block must be a multiple of {_TM} (got {mb})")

    n_pad = n + (-n) % 8
    p_pad = p + (-p) % tile_p
    k_pad = K + (-K) % 128

    Xt = _pad_axis(_pad_axis(X0m.T.astype(f32), 0, p_pad), 1, n_pad)
    Sp = _pad_axis(_pad_axis(S2.astype(f32), 1, n_pad), 2, k_pad)
    Ip = _pad_axis(inv_xn.astype(f32), 1, p_pad)

    p_tiles = p_pad // tile_p
    kernel = functools.partial(
        _kernel, k_pad=k_pad, dot_precision=dot_precision
    )
    # nominal-FLOP convention (multi-pass precisions count one op), same as
    # the MFU accounting in benchmarks/run_all.py
    maxr2 = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((mb, k_pad), f32),
        grid=(mb // _TM, p_tiles),
        # index-map zeros are derived from the i32 grid indices (j * 0, not
        # the literal 0): with jax x64 enabled a literal traces as i64 and
        # Mosaic rejects the mixed index tuple
        in_specs=[
            pl.BlockSpec(
                (_TM, n_pad, k_pad), lambda j, i: (j, j * 0, j * 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_p, n_pad), lambda j, i: (i, i * 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (_TM, tile_p), lambda j, i: (j, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        # marker index dropped: the (TM, k_pad) block is revisited across
        # all marker tiles — the running max stays in VMEM until the last
        out_specs=pl.BlockSpec(
            (_TM, k_pad), lambda j, i: (j, i * 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            # 6 bf16 passes at HIGHEST (3 at HIGH) on the single num dot
            flops=(6 if dot_precision == _HI else 3)
            * 2 * p_pad * n_pad * mb * k_pad,
            bytes_accessed=4
            * (p_pad * n_pad + mb * (n_pad * k_pad + p_pad + k_pad)),
            transcendentals=0,
        ),
        interpret=interpret,
    )(Sp, Xt, Ip)
    # same cancellation floor as the XLA path: r2 can round to >= 1 for a
    # marker perfectly correlated with the residual
    tiny = jnp.finfo(f32).tiny
    return (-0.5 * n) * log10_f32_accurate(
        jnp.maximum(1.0 - maxr2[:, :K], tiny)
    )


def fused_perm_trait_block(X0m, sqrtw_blk, Qblk, *, precision):
    """Permutation-INDEPENDENT trait-block prep for
    :func:`fused_perm_maxlods`, computed once per trait block and reused
    by every permutation chunk (the pallas analog of the XLA engine's
    hoisted ``_bulkperm_xla_trait_block``).

    Returns ``inv_xn`` (mb, p): ``keep / ||(I-P_t)(x_i ⊙ sw_t)||^2`` from
    :func:`ops.bulkperm.perm_trait_marker_parts` (masked degenerate
    markers arrive as xn = +inf there, so 1/xn = 0 exactly).
    """
    from ..ops.bulkperm import perm_trait_marker_parts

    _, xns = perm_trait_marker_parts(
        X0m, sqrtw_blk, Qblk, precision=precision
    )
    inv = (1.0 / xns).astype(jnp.float32)
    # a kept-but-subnormal xn (marker amplitudes ~1e-19, below any real
    # dataset) would overflow 1/xn to +inf and the kernel's num^2 (flushed
    # to 0 on TPU) x inf would NaN the row — clamp nonfinite to 0
    return jnp.where(jnp.isfinite(inv), inv, jnp.zeros_like(inv))


def fused_perm_chunk_inputs(sqrtw_blk, Qblk, wrn_blk, idx_blk):
    """Per-(trait block, perm chunk) prep for :func:`fused_perm_maxlods`.

    Returns ``S2`` (mb, n, Kc): shuffled unit residuals, covariate-
    residualized against each trait's weighted-covariate orthobasis and
    folded with the trait's sqrt-weights — ``sw_t ⊙ (I - Q_t^T Q_t) S_t``
    (the self-adjoint move of the projector from the marker side, so the
    kernel runs ONE dot per (trait, marker tile)).
    """
    f32 = jnp.float32
    St = jnp.transpose(wrn_blk[idx_blk], (2, 1, 0)).astype(f32)  # (mb, n, Kc)
    Q = Qblk.astype(f32)  # (mb, c, n)
    proj = jnp.einsum("tcn,tnk->tck", Q, St, precision=_HI)
    Sr = St - jnp.einsum("tcn,tck->tnk", Q, proj, precision=_HI)
    return sqrtw_blk.astype(f32)[:, :, None] * Sr


def fused_perm_prep(X0m, sqrtw_blk, Qblk, wrn_blk, idx_blk, *, precision):
    """Both prep stages in one call — for single-chunk callers (the
    shard_map body runs one chunk per device call, so nothing is wasted)."""
    S2 = fused_perm_chunk_inputs(sqrtw_blk, Qblk, wrn_blk, idx_blk)
    inv_xn = fused_perm_trait_block(X0m, sqrtw_blk, Qblk, precision=precision)
    return S2, inv_xn
