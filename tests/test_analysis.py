"""Analysis-layer tests (reference test/analysis_helpers_test.jl):
getLL vs direct wls, get_thresholds vs quantiles of per-permutation maxima,
profile_LL shape/location sanity."""

import jax.numpy as jnp
import numpy as np

from bulklmm_tpu import (
    get_thresholds,
    getLL,
    profile_LL,
    scan,
    transform_rotation,
    wls,
)
from bulklmm_tpu.ops.weights import make_weights

rng = np.random.default_rng(17)


def test_getLL_vs_direct_wls(bxd_like):
    y = bxd_like["Y"][:, 2]
    G = bxd_like["G"]
    rot = transform_rotation(
        jnp.asarray(y), jnp.asarray(G), bxd_like["K"], add_intercept=True
    )
    h2 = 0.37
    ll_null, ll_alt = getLL(rot.y0, rot.X0, rot.lam, 1, 5, h2)
    w = make_weights(h2, rot.lam)
    direct_null = wls(rot.y0, rot.X0[:, :1], w).ell[0]
    X_alt = jnp.concatenate([rot.X0[:, :1], rot.X0[:, 5:6]], axis=1)
    direct_alt = wls(rot.y0, X_alt, w).ell[0]
    assert abs(float(ll_null) - float(direct_null)) < 1e-12
    assert abs(float(ll_alt) - float(direct_alt)) < 1e-12


def test_get_thresholds_matches_quantile_of_maxima():
    L = rng.normal(size=(50, 400)) ** 2
    thr = get_thresholds(L, [0.10, 0.05, 0.01])
    maxima = L.max(axis=0)
    expect = np.quantile(maxima, [0.90, 0.95, 0.99])
    assert np.allclose(thr.thrs, expect)
    assert np.all(np.diff(thr.thrs) >= 0)


def test_get_thresholds_from_scan_perms(bxd_like):
    res = scan(
        bxd_like["Y"][:, 0], bxd_like["G"], bxd_like["K"],
        permutation_test=True, nperms=100, rndseed=4,
    )
    thr = get_thresholds(res.L_perms, [0.10, 0.05])
    maxima = np.asarray(res.L_perms).max(axis=0)
    assert np.allclose(thr.thrs, np.quantile(maxima, [0.90, 0.95]))


def test_profile_LL_peaks_near_fitted_h2(bxd_like):
    y = bxd_like["Y"][:, 0]
    G = bxd_like["G"]
    n = len(y)
    covar = jnp.ones((n, 1))
    grid = jnp.arange(0.05, 0.95, 0.05)
    prof = profile_LL(y, G, covar, bxd_like["K"], grid, marker_id=1)
    assert prof.ll_list_null.shape == grid.shape
    assert prof.ll_list_alt.shape == grid.shape
    # alt likelihood dominates null at every grid point (one extra regressor)
    assert np.all(np.asarray(prof.ll_list_alt) >= np.asarray(prof.ll_list_null) - 1e-9)
    # profile maximum should sit near the scan's fitted null h2 (clipped to
    # the grid's range: boundary ML fits land outside any finite grid)
    fit = scan(y, G, bxd_like["K"])
    h2_star = float(grid[int(np.argmax(np.asarray(prof.ll_list_null)))])
    h2_fit = min(max(float(fit.h2_null), float(grid[0])), float(grid[-1]))
    assert abs(h2_star - h2_fit) <= 0.051


def test_scan_profile_ll_flag(bxd_like):
    result, prof = scan(
        bxd_like["Y"][:, 1], bxd_like["G"], bxd_like["K"],
        profile_ll=True, marker_id=2, h2_grid=np.arange(0.1, 0.9, 0.1),
    )
    assert result.ll_list_null is not None
    assert prof.ll_list_null.shape == (8,)


def test_bh_adjust_matches_scipy():
    from scipy.stats import false_discovery_control

    from bulklmm_tpu.analysis import bh_adjust

    p = rng.uniform(0, 1, 500)
    q = bh_adjust(p)
    q_ref = false_discovery_control(p, method="bh")
    assert np.allclose(q, q_ref, atol=1e-12)
    qy = bh_adjust(p, dependent=True)
    qy_ref = false_discovery_control(p, method="by")
    assert np.allclose(qy, qy_ref, atol=1e-12)


def test_lod_fdr_shapes_and_monotonicity(bxd_like):
    from bulklmm_tpu import bulkscan
    from bulklmm_tpu.analysis import lod_fdr

    out = bulkscan(bxd_like["Y"], bxd_like["G"], bxd_like["K"])
    qv, sig = lod_fdr(out.L, alpha=0.10)
    assert qv.shape == out.L.shape and sig.dtype == bool
    # larger LOD -> smaller (or equal) q-value
    L = np.asarray(out.L).ravel()
    order = np.argsort(L)
    assert np.all(np.diff(qv.ravel()[order]) <= 1e-12)


def test_bh_adjust_nan_isolation():
    """A NaN p-value gets a NaN q-value without poisoning the rest (the
    accumulate-from-the-tail monotonicity pass must skip NaNs)."""
    import bulklmm_tpu as bl

    p = np.array([0.001, 0.02, np.nan, 0.5, 0.04])
    q = bl.bh_adjust(p)
    assert np.isnan(q[2])
    ok = np.delete(q, 2)
    assert np.isfinite(ok).all()
    ref = bl.bh_adjust(np.delete(p, 2))
    np.testing.assert_allclose(ok, ref, atol=1e-12)
