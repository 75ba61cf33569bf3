"""Fused bulk-permutation Pallas kernel: genome-wide permutation maxima for
a block of traits without materializing any (markers x traits x perms) LODs.

Reference semantics: per trait, ``scan_perms_lite``'s hot GEMM + per-column
max (src/scan.jl:534-543 + src/analysis_helpers/single_trait_analysis.jl:15)
— here for every trait at once (ops/bulkperm.py derives the batching
identities).

Why a kernel: the full (p, m, nperms) correlation tensor at BXD scale is
7,321 x 35,554 x 1,024 ~ 1 TB — it cannot touch HBM. What the user needs is
only its max over markers. The Pallas grid is one program per 8-trait row
block; each program keeps its (8, K) running-max carry in VMEM, loops the
marker tiles with ``fori_loop``, and writes the (8, K) genome-wide maxima
to HBM exactly once. The rotated marker panel (p x n, ~2 MB at BXD scale)
has a constant index map, so it stays VMEM-resident across the whole grid.

Per (trait, marker-tile) step the kernel re-derives the trait's weighted,
covariate-residualized marker tile in VMEM from (n,)-scale inputs (the
alt-grid kernel's trick, pallas/altgrid_fused.py): weight by the trait's
sqrt-weights, project out the 2-3-column weighted-covariate orthobasis,
then one (TP, n)(n, K) MXU dot against the pre-shuffled unit-normalized
residuals. All dots run at ``Precision.HIGHEST`` (Mosaic's default f32 dot
is single-pass bf16 — ~1e-3 relative, far outside the 1e-5 parity bar).
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


def _kernel(w_ref, q_ref, x_ref, s_ref, o_ref, *, n, p_tiles, tile_p, k_pad):
    """One program = 8 traits x all perms x all marker tiles.

    w_ref: (TM, n_pad)        per-trait sqrt-weights
    q_ref: (TM, c, n_pad)     per-trait weighted-covariate orthobasis Q^T
    x_ref: (p_pad, n_pad)     markers^T, constant across programs
    s_ref: (TM, n_pad, k_pad) pre-shuffled unit-normalized residuals
    o_ref: (TM, k_pad)        genome-wide max LOD per (trait, perm)
    """
    tiny = jnp.finfo(jnp.float32).tiny
    rows = []
    for t in range(_TM):
        sw = w_ref[t, :]  # (n_pad,)
        Qt = q_ref[t]  # (c, n_pad)
        St = s_ref[t]  # (n_pad, k_pad)

        def body(i, acc, sw=sw, Qt=Qt, St=St):
            # i32 offset arithmetic: with jax x64 enabled a python-int
            # factor traces as i64 and Mosaic rejects the mixed mul
            Xt = x_ref[pl.ds(i * jnp.int32(tile_p), tile_p), :]  # (TP, n_pad)
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
            # padded marker rows are all-zero => num = 0, xn = 0 -> r2 = 0
            r2 = (num * num) / jnp.maximum(xn, tiny)
            return jnp.maximum(acc, jnp.max(r2, axis=0, keepdims=True))

        acc = jax.lax.fori_loop(
            jnp.int32(0), jnp.int32(p_tiles), body,
            jnp.zeros((1, k_pad), dtype=jnp.float32),
        )
        # same cancellation floor as the XLA path: r2 can round to >= 1 for
        # a marker perfectly correlated with the residual
        rows.append(
            (-0.5 * n) * log10_f32_accurate(jnp.maximum(1.0 - acc, tiny))
        )
    o_ref[:] = jnp.concatenate(rows, axis=0)


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
    kernel = functools.partial(
        _kernel, n=n, p_tiles=p_tiles, tile_p=tile_p, k_pad=k_pad
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((mb, k_pad), f32),
        grid=(mb // _TM,),
        # index-map zeros are derived from the i32 grid index (j * 0, not
        # the literal 0): with jax x64 enabled a literal traces as i64 and
        # Mosaic rejects the mixed index tuple
        in_specs=[
            pl.BlockSpec(
                (_TM, n_pad), lambda j: (j, j * 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (_TM, c, n_pad), lambda j: (j, j * 0, j * 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (p_pad, n_pad), lambda j: (j * 0, j * 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (_TM, n_pad, k_pad), lambda j: (j, j * 0, j * 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (_TM, k_pad), lambda j: (j, j * 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
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
    return out[:, :K]
