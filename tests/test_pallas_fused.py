"""Fused Pallas kernel vs the XLA kernel (interpret mode on CPU), and the
accurate-f32 log10 + precision presets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bulklmm_tpu.ops.liteqtl import lods_per_trait
from bulklmm_tpu.ops.lod import log10_f32_accurate
from bulklmm_tpu.pallas import fused_lods_per_trait
from bulklmm_tpu.utils.config import BALANCED, EXACT64, FAST32, MIXED

rng = np.random.default_rng(3)


def _mk(n=48, p=96, m=64, c=1):
    Y0 = jnp.asarray(rng.normal(size=(n, m)).astype(np.float32))
    X0m = jnp.asarray(rng.normal(size=(n, p)).astype(np.float32))
    cols = [np.ones((n, 1))] + [rng.normal(size=(n, 1)) for _ in range(c - 1)]
    C0 = jnp.asarray(np.concatenate(cols, axis=1).astype(np.float32))
    lam = jnp.asarray(rng.uniform(0.1, 2.0, n).astype(np.float32))
    h2 = jnp.asarray(rng.uniform(0.0, 0.9, m).astype(np.float32))
    return Y0, X0m, C0, lam, h2


@pytest.mark.parametrize("c", [1, 2, 3])
def test_fused_matches_xla_kernel(c):
    Y0, X0m, C0, lam, h2 = _mk(c=c)
    ref = lods_per_trait(Y0, X0m, C0, lam, h2, precision=FAST32)
    fused = fused_lods_per_trait(
        Y0, X0m, C0, lam, h2, tile_p=32, tile_m=32, interpret=True
    )
    assert fused.shape == ref.shape
    assert float(jnp.max(jnp.abs(ref - fused))) < 5e-5


def test_fused_nondivisible_tiles():
    Y0, X0m, C0, lam, h2 = _mk(p=70, m=45)
    ref = lods_per_trait(Y0, X0m, C0, lam, h2, precision=FAST32)
    fused = fused_lods_per_trait(
        Y0, X0m, C0, lam, h2, tile_p=32, tile_m=32, interpret=True
    )
    assert fused.shape == (70, 45)
    assert float(jnp.max(jnp.abs(ref - fused))) < 5e-5


def test_log10_f32_accurate():
    x = np.random.default_rng(0).uniform(1e-7, 1.0, 50000).astype(np.float32)
    y = np.asarray(log10_f32_accurate(jnp.asarray(x)))
    assert np.max(np.abs(y - np.log10(x.astype(np.float64)))) < 2e-6
    # domain guard
    bad = np.asarray(log10_f32_accurate(jnp.asarray([-1.0, 0.0], dtype=jnp.float32)))
    assert np.isnan(bad).all()


def test_precision_presets_agree(bxd_like):
    """FAST32 and MIXED must track EXACT64 within their documented bars."""
    from bulklmm_tpu import bulkscan

    Y, G, K = bxd_like["Y"], bxd_like["G"], bxd_like["K"]
    exact = bulkscan(Y, G, K, precision=EXACT64)
    mixed = bulkscan(Y, G, K, precision=MIXED)
    balanced = bulkscan(Y, G, K, precision=BALANCED)
    fast = bulkscan(Y, G, K, precision=FAST32)
    assert float(jnp.max(jnp.abs(mixed.L - exact.L))) < 1e-4
    assert float(jnp.max(jnp.abs(balanced.L - exact.L))) < 1e-4
    assert float(jnp.max(jnp.abs(fast.L.astype(jnp.float64) - exact.L))) < 1e-3
    # h2 grid selection must be identical across the f64-grid precisions
    assert np.array_equal(
        np.asarray(mixed.h2_null_list), np.asarray(exact.h2_null_list)
    )
    assert np.array_equal(
        np.asarray(balanced.h2_null_list), np.asarray(exact.h2_null_list)
    )
