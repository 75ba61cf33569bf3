"""Permutation-scan and weighted-errors tests (reference test/kinship_test.jl
determinism block and test/weighted_error_test.jl)."""

import jax.numpy as jnp
import numpy as np

from bulklmm_tpu import bulkscan, get_thresholds, scan, scan_perms_lite


def test_perm_lod_column0_equals_null_scan(bxd_like):
    y = bxd_like["Y"][:, 0]
    null = scan(y, bxd_like["G"], bxd_like["K"])
    perm = scan(y, bxd_like["G"], bxd_like["K"], permutation_test=True, nperms=64)
    assert np.max(np.abs(np.asarray(perm.lod) - np.asarray(null.lod))) < 1e-10
    assert perm.L_perms.shape == (bxd_like["p"], 64)


def test_perm_determinism_under_seed(bxd_like):
    """Same seed -> exactly equal LODs and thresholds (reference
    test/kinship_test.jl:9-15)."""
    y = bxd_like["Y"][:, 1]
    a = scan(y, bxd_like["G"], bxd_like["K"], permutation_test=True, nperms=100, rndseed=7)
    b = scan(y, bxd_like["G"], bxd_like["K"], permutation_test=True, nperms=100, rndseed=7)
    assert np.array_equal(np.asarray(a.L_perms), np.asarray(b.L_perms))
    ta = get_thresholds(a.L_perms, [0.10, 0.05])
    tb = get_thresholds(b.L_perms, [0.10, 0.05])
    assert np.array_equal(ta.thrs, tb.thrs)
    c = scan(y, bxd_like["G"], bxd_like["K"], permutation_test=True, nperms=100, rndseed=8)
    assert not np.array_equal(np.asarray(a.L_perms), np.asarray(c.L_perms))


def test_thresholds_are_quantiles_of_maxima(bxd_like):
    y = bxd_like["Y"][:, 2]
    out = scan(y, bxd_like["G"], bxd_like["K"], permutation_test=True, nperms=200)
    peaks = np.max(np.asarray(out.L_perms), axis=0)
    thr = get_thresholds(out.L_perms, [0.10, 0.05])
    assert np.allclose(thr.thrs, np.quantile(peaks, [0.90, 0.95]))
    assert thr.thrs[1] >= thr.thrs[0]


def test_scan_perms_lite_standalone(bxd_like):
    y = bxd_like["Y"][:, 3]
    covar = np.ones((bxd_like["n"], 1))
    out = scan_perms_lite(y, bxd_like["G"], covar, bxd_like["K"],
                          add_intercept=False, nperms=32, prior_variance=0.0)
    base = scan(y, bxd_like["G"], bxd_like["K"])
    assert np.max(np.abs(np.asarray(out.lod) - np.asarray(base.lod))) < 1e-10


def test_perm_output_pvals(bxd_like):
    """The permutation path's p-value outputs (log10pvals + log10Pvals_perms)
    — the fix for the reference's UndefVarError at src/scan.jl:551
    (COMPAT.md #2) — must match a direct host-scipy conversion of the LODs
    and be shape-consistent with L_perms."""
    from scipy.stats import chi2

    from bulklmm_tpu.ops import lod as lodmod

    y = bxd_like["Y"][:, 4]
    res = scan(y, bxd_like["G"], bxd_like["K"], permutation_test=True,
               nperms=64, output_pvals=True, chisq_df=1)
    assert res.log10Pvals_perms is not None
    assert res.log10Pvals_perms.shape == res.L_perms.shape
    assert res.log10pvals.shape == res.lod.shape

    # independent host-scipy conversion: LOD -> chi2 LRT -> -log10 p
    def ref_log10p(lods, df=1):
        chisq = 2.0 * np.log(10.0) * np.asarray(lods)
        return -np.log10(chi2.sf(chisq, df))

    assert np.allclose(np.asarray(res.log10pvals), ref_log10p(res.lod), atol=1e-10)
    assert np.allclose(
        np.asarray(res.log10Pvals_perms), ref_log10p(res.L_perms), atol=1e-10
    )
    # the jit-usable device variant agrees with host scipy on the same output
    dev = np.asarray(lodmod.lod2log10p_device(jnp.asarray(res.L_perms), 1))
    assert np.allclose(dev, ref_log10p(res.L_perms), atol=1e-8)

    # scan_perms_lite exposes the same outputs
    covar = np.ones((bxd_like["n"], 1))
    lite = scan_perms_lite(y, bxd_like["G"], covar, bxd_like["K"],
                           add_intercept=False, nperms=32, output_pvals=True)
    assert lite.log10Pvals_perms is not None
    assert lite.log10Pvals_perms.shape == lite.L_perms.shape
    assert np.allclose(
        np.asarray(lite.log10Pvals_perms), ref_log10p(lite.L_perms), atol=1e-10
    )


def test_identity_weights_equal_unweighted(bxd_like):
    """weights == ones reproduces the unweighted scan exactly (reference
    test/weighted_error_test.jl:42-141)."""
    y = bxd_like["Y"][:, 4]
    ones = np.ones(bxd_like["n"])
    a = scan(y, bxd_like["G"], bxd_like["K"])
    b = scan(y, bxd_like["G"], bxd_like["K"], weights=ones)
    assert np.max(np.abs(np.asarray(a.lod) - np.asarray(b.lod))) < 1e-9
    ba = bulkscan(bxd_like["Y"], bxd_like["G"], bxd_like["K"], method="null-grid")
    bb = bulkscan(bxd_like["Y"], bxd_like["G"], bxd_like["K"], method="null-grid", weights=ones)
    assert np.max(np.abs(np.asarray(ba.L) - np.asarray(bb.L))) < 1e-9


def test_weights_equal_manual_prescaling(bxd_like):
    """scan(weights=w) == scan on manually pre-scaled data with W=diag(w)."""
    rng = np.random.default_rng(3)
    w = rng.uniform(0.5, 2.0, bxd_like["n"])
    y = bxd_like["Y"][:, 5]
    G, K = bxd_like["G"], bxd_like["K"]
    a = scan(y, G, K, weights=w)
    # manual: y,G,[1] scaled by W, K -> WKW, no intercept re-added
    W = np.diag(w)
    y_st = W @ y
    G_st = W @ G
    covar_st = W @ np.ones((bxd_like["n"], 1))
    K_st = W @ K @ W
    b = scan(y_st, G_st, K_st, covar=covar_st, add_intercept=False)
    assert np.max(np.abs(np.asarray(a.lod) - np.asarray(b.lod))) < 1e-9
    assert abs(float(a.h2_null) - float(b.h2_null)) < 1e-8


def test_bulkscan_weights_equal_manual_prescaling(bxd_like):
    """Weighted bulkscan (all three methods) == manually pre-scaled data
    (reference test/weighted_error_test.jl:42-141 covers scan,
    bulkscan_null and bulkscan_null_grid)."""
    from bulklmm_tpu import bulkscan

    rng2 = np.random.default_rng(5)
    Y, G, K = bxd_like["Y"][:, :6], bxd_like["G"], bxd_like["K"]
    n = bxd_like["n"]
    w = rng2.uniform(0.5, 2.0, n)
    W = np.diag(w)
    Ym, Gm = W @ Y, W @ G
    covm = W @ np.ones((n, 1))
    Km = W @ K @ W
    for method in ("null-grid", "null-exact", "alt-grid"):
        a = bulkscan(Y, G, K, weights=w, method=method)
        b = bulkscan(Ym, Gm, Km, covar=covm, add_intercept=False, method=method)
        assert np.allclose(np.asarray(a.L), np.asarray(b.L), atol=1e-8), method
