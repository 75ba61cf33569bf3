"""Timeboxed probe (VERDICT r4 item 8): is the alt-grid kernel's
(TP, TM) min + int8 argmax carry a material cost?

Round 4 measured the 3-pass MXU tier buying only 1.12x on alt-grid and
attributed the ceiling to per-cell VPU work. This probe isolates ONE
candidate: drop the argmax carry entirely (running minimum only — the
LOD matrix without the h2 panel) and compare against the shipped kernel
at BXD scale. If the saving is real, an `output_h2_panel=False` fast
path is worth wiring; if not, the question closes as a measured
negative like the round-4 shuffle question.

Run on the TPU host: python benchmarks/probe_altgrid_argmax.py
"""

from __future__ import annotations

import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bulklmm_tpu.ops.lod import log10_f32_accurate
from bulklmm_tpu.ops.smallchol import residual_keep_mask
from bulklmm_tpu.ops.weights import make_weights

_HI = jax.lax.Precision.HIGHEST


def _kernel_nomax(s_ref, qt_ref, xt_ref, y_ref, c_ref, u_ref, *, n, g):
    """The shipped kernel body minus the argmax carry: running min only."""
    k = pl.program_id(2)
    tiny = jnp.finfo(jnp.float32).tiny
    s = s_ref[0, 0, :]
    Qt = qt_ref[0]
    Xw = xt_ref[:] * s[None, :]
    pX = jax.lax.dot_general(Xw, Qt, (((1,), (1,)), ((), ())), precision=_HI)
    Xr = Xw - jax.lax.dot_general(pX, Qt, (((1,), (0,)), ((), ())),
                                  precision=_HI)
    xn = jnp.sum(Xr * Xr, axis=1, keepdims=True)
    Yw = y_ref[:] * s[:, None]
    pY = jax.lax.dot_general(Qt, Yw, (((1,), (0,)), ((), ())), precision=_HI)
    Yr = Yw - jax.lax.dot_general(Qt, pY, (((0,), (0,)), ((), ())),
                                  precision=_HI)
    yn = jnp.sum(Yr * Yr, axis=0, keepdims=True)
    dims = (((1,), (0,)), ((), ()))
    num = jax.lax.dot_general(Xr, Yr, dims, precision=_HI)
    keep = residual_keep_mask(
        xn, jnp.sum(Xw * Xw, axis=1, keepdims=True)
    ) * residual_keep_mask(yn, jnp.sum(Yw * Yw, axis=0, keepdims=True))
    r2 = keep * (num * num) / jnp.maximum(xn * yn, tiny)
    u = jnp.maximum(jnp.maximum(1.0 - r2, tiny) * c_ref[0, 0, :][None, :],
                    tiny)

    @pl.when(k == 0)
    def _():
        u_ref[:] = u

    @pl.when(k > 0)
    def _():
        u_ref[:] = jnp.minimum(u_ref[:], u)

    @pl.when(k == g - 1)
    def _():
        u_ref[:] = (-0.5 * n) * log10_f32_accurate(u_ref[:])


def run_nomax(Y0, X0m, C0, lam, h2_grid, *, prior, tile_p=512, tile_m=1024):
    from bulklmm_tpu.models.bulkscan import grid_null_ell

    f32 = jnp.float32
    n, m = Y0.shape
    p = X0m.shape[1]
    c = C0.shape[1]
    g = int(h2_grid.shape[0])
    ells = grid_null_ell(Y0, C0, lam, h2_grid, prior, reml=False)
    ell0max = jnp.max(ells, axis=0)
    cmat = jnp.exp(-(2.0 / n) * (ells - ell0max[None, :])).astype(f32)
    W = jnp.abs(make_weights(h2_grid, lam))
    S = jnp.sqrt(W)
    Cw = C0[None, :, :] * S[:, :, None]
    Q = jnp.linalg.qr(Cw, mode="reduced")[0]
    n_pad = n + (-n) % 8
    p_pad = p + (-p) % tile_p
    m_pad = m + (-m) % tile_m

    def pad_to(x, rows, cols):
        out = jnp.zeros((rows, cols), dtype=x.dtype)
        return out.at[: x.shape[0], : x.shape[1]].set(x)

    Xt = pad_to(X0m.T.astype(f32), p_pad, n_pad)
    Yp = pad_to(Y0.astype(f32), n_pad, m_pad)
    Sp = pad_to(S.astype(f32), g, n_pad).reshape(g, 1, n_pad)
    Qt = jnp.zeros((g, c, n_pad), dtype=f32).at[:, :, :n].set(
        jnp.swapaxes(Q, 1, 2).astype(f32)
    )
    cp = jnp.ones((g, m_pad), dtype=f32).at[:, :m].set(cmat).reshape(
        g, 1, m_pad
    )
    grid = (p_pad // tile_p, m_pad // tile_m, g)
    kernel = functools.partial(_kernel_nomax, n=n, g=g)
    L = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((p_pad, m_pad), f32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, n_pad), lambda i, j, k: (k, i * 0, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, n_pad), lambda i, j, k: (k, i * 0, i * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_p, n_pad), lambda i, j, k: (i, j * 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, tile_m), lambda i, j, k: (i * 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile_m), lambda i, j, k: (k, i * 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_p, tile_m), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(Sp, Qt, Xt, Yp, cp)
    return L[:p, :m]


def main():
    from bulklmm_tpu.ops.rotation import kinship_eigen
    from bulklmm_tpu.pallas.altgrid_fused import fused_alt_grid

    rng = np.random.default_rng(0)
    n, p, m = 79, 7321, 35554
    G = rng.uniform(0, 1, (n, p)).astype(np.float32)
    X = G.astype(np.float64) - 0.5
    K = 2 * X @ X.T / p + 0.5
    np.fill_diagonal(K, 1.0)
    Y = rng.normal(size=(n, m)).astype(np.float32)
    Ut, lam = kinship_eigen(K)
    Y0 = jnp.asarray(Ut @ Y, dtype=jnp.float32)
    X0m = jnp.asarray(Ut @ G, dtype=jnp.float32)
    C0 = jnp.asarray(Ut @ np.ones((n, 1)), dtype=jnp.float32)
    lam_d = jnp.asarray(lam, dtype=jnp.float32)
    grid = jnp.arange(0.0, 0.91, 0.1, dtype=jnp.float32)
    prior = (1.0, 0.0)

    full = jax.jit(lambda: fused_alt_grid(
        Y0, X0m, C0, lam_d, grid, prior=prior))
    nomax = jax.jit(lambda: run_nomax(
        Y0, X0m, C0, lam_d, grid, prior=prior))

    Lf, kmax = full()
    Ln = nomax()
    d = float(jnp.max(jnp.abs(Lf - Ln)))
    print(f"L agreement full-vs-nomax: {d:.2e}")

    def bench(f, fetch):
        fetch(f())
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            fetch(f())
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_full = bench(full, lambda r: float(jnp.sum(r[0])))
    t_nomax = bench(nomax, lambda r: float(jnp.sum(r)))
    print(f"full kernel (min + argmax carry): {t_full * 1e3:.1f} ms")
    print(f"nomax kernel (min only):          {t_nomax * 1e3:.1f} ms")
    print(f"speedup from dropping argmax:     {t_full / t_nomax:.3f}x")


if __name__ == "__main__":
    main()
