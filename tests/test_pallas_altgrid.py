"""Fused alt-grid Pallas kernel (pallas/altgrid_fused.py) vs the XLA
``lax.scan`` formulation, in interpreter mode on CPU.

The real-hardware equivalence check is benchmarks/tpu_validation.py's
``bulk_alt_grid`` row, which exercises this kernel (engine="auto" selects it
on TPU) against the CPU float64 oracle at 2e-5.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bulklmm_tpu.models.bulkscan import _alt_grid_impl, bulkscan
from bulklmm_tpu.pallas.altgrid_fused import fused_alt_grid
from bulklmm_tpu.utils.config import BALANCED


@pytest.fixture(scope="module")
def rotated():
    rng = np.random.default_rng(3)
    n, p, m, c = 40, 96, 48, 2
    return dict(
        Y0=jnp.asarray(rng.normal(size=(n, m))),
        X0m=jnp.asarray(rng.normal(size=(n, p))),
        C0=jnp.asarray(np.column_stack([np.ones(n), rng.normal(size=n)])),
        lam=jnp.asarray(np.sort(rng.uniform(0.05, 3.0, n))),
    )


@pytest.mark.parametrize("reml", [False, True])
def test_fused_matches_xla_impl(rotated, reml):
    h2_grid = jnp.arange(0.0, 0.91, 0.1)
    prior = (1.0, 0.0)
    L_ref, h2_ref = _alt_grid_impl(
        rotated["Y0"], rotated["X0m"], rotated["C0"], rotated["lam"], h2_grid,
        prior=prior, reml=reml, method="qr", precision=BALANCED,
    )
    L_pl, h2_pl = fused_alt_grid(
        rotated["Y0"], rotated["X0m"], rotated["C0"], rotated["lam"], h2_grid,
        prior=prior, reml=reml, interpret=True, tile_p=32, tile_m=128,
    )
    # f32 kernel vs f64 XLA combine: f32-level agreement
    assert float(jnp.max(jnp.abs(L_pl - L_ref))) < 5e-5
    assert float(jnp.mean((h2_pl != h2_ref).astype(jnp.float32))) == 0.0


def test_fused_throughput_tier(rotated):
    """dot_precision=HIGH takes the manual bf16x3 split branch (Mosaic has
    no Precision.HIGH lowering): screening-tier agreement with the exact
    kernel, finite everywhere."""
    import jax

    h2_grid = jnp.arange(0.0, 0.91, 0.1)
    prior = (1.0, 0.0)
    L_hi, h2_hi = fused_alt_grid(
        rotated["Y0"], rotated["X0m"], rotated["C0"], rotated["lam"], h2_grid,
        prior=prior, reml=False, interpret=True, tile_p=32, tile_m=128,
    )
    L_tp, h2_tp = fused_alt_grid(
        rotated["Y0"], rotated["X0m"], rotated["C0"], rotated["lam"], h2_grid,
        prior=prior, reml=False, interpret=True, tile_p=32, tile_m=128,
        dot_precision=jax.lax.Precision.HIGH,
    )
    err = float(jnp.max(jnp.abs(L_tp - L_hi)))
    assert jnp.all(jnp.isfinite(L_tp))
    assert err < 2e-2  # screening tier, not the 1e-5 parity bar
    # argmax panel may flip only where the grid profile is near-flat
    assert float(jnp.mean((h2_tp != h2_hi).astype(jnp.float32))) < 0.2


def test_fused_single_grid_point(rotated):
    """g=1 runs the k==0 and k==g-1 branches in the same kernel invocation."""
    h2_grid = jnp.asarray([0.3])
    L_ref, _ = _alt_grid_impl(
        rotated["Y0"], rotated["X0m"], rotated["C0"], rotated["lam"], h2_grid,
        prior=(1.0, 0.0), reml=False, method="qr", precision=BALANCED,
    )
    L_pl, h2_pl = fused_alt_grid(
        rotated["Y0"], rotated["X0m"], rotated["C0"], rotated["lam"], h2_grid,
        prior=(1.0, 0.0), reml=False, interpret=True, tile_p=32, tile_m=128,
    )
    assert float(jnp.max(jnp.abs(L_pl - L_ref))) < 5e-5
    assert float(jnp.max(jnp.abs(h2_pl - 0.3))) < 1e-12


def test_engine_kwarg_validation():
    rng = np.random.default_rng(0)
    n = 20
    Y = rng.normal(size=(n, 4))
    G = rng.uniform(0, 1, (n, 8))
    K = np.eye(n) * 0.9 + 0.1
    with pytest.raises(ValueError, match="engine"):
        bulkscan(Y, G, K, method="alt-grid", engine="banana")
    with pytest.raises(ValueError, match="alt-grid"):
        bulkscan(Y, G, K, method="null-grid", engine="pallas")
    # engine="xla" always valid; "auto" on CPU resolves to XLA
    a = bulkscan(Y, G, K, method="alt-grid", engine="xla")
    b = bulkscan(Y, G, K, method="alt-grid", engine="auto")
    assert float(jnp.max(jnp.abs(a.L - b.L))) == 0.0


def test_grid_longer_than_int8_rejected(rotated):
    with pytest.raises(ValueError, match="127"):
        fused_alt_grid(
            rotated["Y0"], rotated["X0m"], rotated["C0"], rotated["lam"],
            jnp.linspace(0.0, 0.9, 128), prior=(1.0, 0.0), interpret=True,
        )


def test_fused_no_panel_variant(rotated):
    """output_h2_panel=False (min-only VMEM carry, measured 1.095x on
    chip): identical LODs, panel None (VERDICT r4 item 8)."""
    h2_grid = jnp.arange(0.0, 0.91, 0.1)
    prior = (1.0, 0.0)
    L_full, panel = fused_alt_grid(
        rotated["Y0"], rotated["X0m"], rotated["C0"], rotated["lam"],
        h2_grid, prior=prior, reml=False, interpret=True, tile_p=32,
        tile_m=128,
    )
    L_min, none = fused_alt_grid(
        rotated["Y0"], rotated["X0m"], rotated["C0"], rotated["lam"],
        h2_grid, prior=prior, reml=False, interpret=True, tile_p=32,
        tile_m=128, output_h2_panel=False,
    )
    assert none is None and panel is not None
    assert float(jnp.max(jnp.abs(L_full - L_min))) == 0.0


def test_bulkscan_output_h2_panel_flag(rotated):
    """bulkscan(..., output_h2_panel=False) on the XLA path returns the
    same L with h2_panel=None (the flag elides the PALLAS argmax carry;
    XLA computes it either way and just drops it)."""
    import numpy as np

    import bulklmm_tpu as bl

    rng = np.random.default_rng(4)
    n, p, m = 40, 30, 6
    G = rng.uniform(0, 1, (n, p))
    K = np.asarray(bl.calc_kinship(G))
    Y = rng.normal(size=(n, m))
    a = bl.bulkscan(Y, G, K, method="alt-grid")
    b = bl.bulkscan(Y, G, K, method="alt-grid", output_h2_panel=False)
    assert b.h2_panel is None and a.h2_panel is not None
    assert float(jnp.max(jnp.abs(jnp.asarray(a.L) - jnp.asarray(b.L)))) == 0.0
