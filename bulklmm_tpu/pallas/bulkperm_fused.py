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

Per (trait, marker-tile) step the kernel re-derives the trait's weighted,
covariate-residualized marker tile in VMEM from (n,)-scale inputs (the
alt-grid kernel's trick, pallas/altgrid_fused.py): weight by the trait's
sqrt-weights, project out the 2-3-column weighted-covariate orthobasis,
then one (TP, n)(n, K) MXU dot against the pre-shuffled unit-normalized
residuals. All dots run at ``Precision.HIGHEST`` (Mosaic's default f32 dot
is single-pass bf16 — ~1e-3 relative, far outside the 1e-5 parity bar).
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


def _kernel(w_ref, q_ref, x_ref, s_ref, o_ref, *, k_pad):
    """One program = 8 traits x all perms x ONE marker tile.

    w_ref: (TM, n_pad)        per-trait sqrt-weights
    q_ref: (TM, c, n_pad)     per-trait weighted-covariate orthobasis Q^T
    x_ref: (tile_p, n_pad)    this marker tile, transposed
    s_ref: (TM, n_pad, k_pad) pre-shuffled unit-normalized residuals
    o_ref: (TM, k_pad)        running max r^2 per (trait, perm) — revisited
                              across marker tiles (index map ignores the
                              marker grid index)
    """
    tiny = jnp.finfo(jnp.float32).tiny
    Xt = x_ref[:]  # (TP, n_pad)
    rows = []
    for t in range(_TM):
        sw = w_ref[t, :]  # (n_pad,)
        Qt = q_ref[t]  # (c, n_pad)
        St = s_ref[t]  # (n_pad, k_pad)
        Xw = Xt * sw[None, :]
        pX = jax.lax.dot_general(
            Xw, Qt, (((1,), (1,)), ((), ())), precision=_HI
        )  # (TP, c)
        Xr = Xw - jax.lax.dot_general(
            pX, Qt, (((1,), (0,)), ((), ())), precision=_HI
        )
        xn = jnp.sum(Xr * Xr, axis=1, keepdims=True)  # (TP, 1)
        num = jax.lax.dot_general(
            Xr, St, (((1,), (0,)), ((), ())), precision=_HI
        )  # (TP, k_pad)
        # padded marker rows are all-zero => num = 0, xn = 0 -> r2 = 0;
        # covariate-collinear markers residualize to rounding noise — the
        # relative rank mask maps them to r2 = 0 exactly, matching the XLA
        # engine (ops/smallchol.py::residual_keep_mask, COMPAT.md #15)
        eps = jnp.finfo(jnp.float32).eps
        keep = (xn > (1024.0 * eps) ** 2
                * jnp.sum(Xw * Xw, axis=1, keepdims=True)).astype(num.dtype)
        r2 = keep * (num * num) / jnp.maximum(xn, tiny)
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
    sqrtw,
    Qstack,
    Sperm,
    *,
    n: int,
    tile_p: int = 512,
    interpret: bool = False,
):
    """(mb, K) genome-wide max LODs for a block of traits.

    X0m: (n, p) rotated markers; sqrtw: (mb, n); Qstack: (mb, c, n);
    Sperm: (mb, n, K) pre-shuffled unit-normalized whitened residuals
    (``ops.bulkperm.perm_trait_parts`` + a gather on the shared permutation
    indices). ``n`` is the true sample count (LOD factor). f32 kernel;
    composable under jit.
    """
    f32 = jnp.float32
    mb, c, _ = Qstack.shape
    p = X0m.shape[1]
    K = Sperm.shape[2]
    if mb % _TM:
        raise ValueError(f"trait block must be a multiple of {_TM} (got {mb})")

    n_pad = n + (-n) % 8
    p_pad = p + (-p) % tile_p
    k_pad = K + (-K) % 128

    Xt = _pad_axis(_pad_axis(X0m.T.astype(f32), 0, p_pad), 1, n_pad)
    Wp = _pad_axis(sqrtw.astype(f32), 1, n_pad)
    Qp = _pad_axis(Qstack.astype(f32), 2, n_pad)
    Sp = _pad_axis(_pad_axis(Sperm.astype(f32), 1, n_pad), 2, k_pad)

    p_tiles = p_pad // tile_p
    kernel = functools.partial(_kernel, k_pad=k_pad)
    maxr2 = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((mb, k_pad), f32),
        grid=(mb // _TM, p_tiles),
        # index-map zeros are derived from the i32 grid indices (j * 0, not
        # the literal 0): with jax x64 enabled a literal traces as i64 and
        # Mosaic rejects the mixed index tuple
        in_specs=[
            pl.BlockSpec(
                (_TM, n_pad), lambda j, i: (j, j * 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (_TM, c, n_pad), lambda j, i: (j, j * 0, j * 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_p, n_pad), lambda j, i: (i, i * 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (_TM, n_pad, k_pad), lambda j, i: (j, j * 0, j * 0),
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
            # HIGHEST = 6 bf16 passes on every dot; the two c-wide
            # residualization dots pad their tiny dim to the MXU quantum
            flops=6 * 2 * p_pad * n_pad * mb * (k_pad + 2 * 128),
            bytes_accessed=4
            * (p_pad * n_pad + mb * n_pad * (k_pad + c + 1) + mb * k_pad),
            transcendentals=mb * k_pad,
        ),
        interpret=interpret,
    )(Wp, Qp, Xt, Sp)
    # same cancellation floor as the XLA path: r2 can round to >= 1 for a
    # marker perfectly correlated with the residual
    tiny = jnp.finfo(f32).tiny
    return (-0.5 * n) * log10_f32_accurate(
        jnp.maximum(1.0 - maxr2[:, :K], tiny)
    )
