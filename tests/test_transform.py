"""Rotation / reweight / permute invariants (reference
test/transform_helpers_test.jl) and analysis helpers (reference
test/analysis_helpers_test.jl)."""

import jax.numpy as jnp
import numpy as np
import pytest

from bulklmm_tpu import getLL, profile_LL, transform_reweight, transform_rotation, wls
from bulklmm_tpu.ops.rotation import transform_permute
from bulklmm_tpu.ops.weights import make_weights


def test_rotation_preserves_geometry(bxd_like):
    """U^T is orthonormal: norms and inner products preserved; lambda matches
    eigvalsh; rotated model has diagonal covariance structure."""
    y = bxd_like["Y"][:, 0]
    rot = transform_rotation(y, bxd_like["G"], bxd_like["K"], add_intercept=True)
    assert np.allclose(np.linalg.norm(np.asarray(rot.y0)), np.linalg.norm(y))
    lam_ref = np.linalg.eigvalsh(bxd_like["K"])
    assert np.allclose(np.sort(np.asarray(rot.lam)), np.sort(lam_ref), atol=1e-10)
    # eigen returns ascending eigenvalues (Julia eigen convention)
    assert np.all(np.diff(np.asarray(rot.lam)) >= -1e-12)


def test_rotation_svd_descending(bxd_like):
    rot = transform_rotation(
        bxd_like["Y"][:, 0], bxd_like["G"], bxd_like["K"],
        add_intercept=True, decomp_scheme="svd",
    )
    assert np.all(np.diff(np.asarray(rot.lam)) <= 1e-12)


def test_rotation_dimension_mismatch():
    with pytest.raises(ValueError):
        transform_rotation(np.zeros(5), np.zeros((6, 2)), np.eye(5))


def test_rotation_warns_on_negative_eigenvalues():
    K = np.eye(4)
    K[0, 0] = -1.0  # indefinite
    with pytest.warns(UserWarning, match="Negative eigenvalues"):
        transform_rotation(np.ones(4), np.ones((4, 1)), K, add_intercept=False)


def test_reweight_outputs(bxd_like):
    y = bxd_like["Y"][:, 1]
    rot = transform_rotation(y, bxd_like["G"], bxd_like["K"], add_intercept=True)
    rw = transform_reweight(rot.y0, rot.X0, rot.lam, n_covars=1)
    # X00 columns orthogonal to the weighted covariate block
    sqrtw = np.sqrt(np.asarray(make_weights(rw.h2_null, rot.lam)))
    wcov = np.asarray(rot.X0[:, :1]) * sqrtw[:, None]
    assert np.allclose(wcov.T @ np.asarray(rw.X00), 0.0, atol=1e-8)
    assert float(rw.sigma2_e) > 0.0
    assert 0.0 <= float(rw.h2_null) < 1.0


def test_permute_deterministic_and_multiset(bxd_like):
    r0 = np.random.default_rng(0).normal(size=(bxd_like["n"], 1))
    a = np.asarray(transform_permute(jnp.asarray(r0), nperms=16, rndseed=5))
    b = np.asarray(transform_permute(jnp.asarray(r0), nperms=16, rndseed=5))
    assert np.array_equal(a, b)
    assert np.allclose(a[:, 0], r0[:, 0])
    for j in range(1, 17):
        assert np.allclose(np.sort(a[:, j]), np.sort(r0[:, 0]))
    with pytest.raises(ValueError):
        transform_permute(jnp.asarray(r0), nperms=-1)


def test_getLL_matches_direct_wls(bxd_like):
    """getLL == direct wls at the same h2 (reference
    test/analysis_helpers_test.jl:17-27)."""
    y = bxd_like["Y"][:, 2]
    rot = transform_rotation(y, bxd_like["G"], bxd_like["K"], add_intercept=True)
    h2 = 0.37
    ll_null, ll_marker = getLL(rot.y0, rot.X0, rot.lam, 1, 17, h2)
    w = make_weights(h2, rot.lam)
    direct_null = wls(rot.y0, rot.X0[:, :1], w).ell[0]
    X = jnp.concatenate([rot.X0[:, :1], rot.X0[:, 17:18]], axis=1)
    direct_marker = wls(rot.y0, X, w).ell[0]
    assert abs(float(ll_null) - float(direct_null)) < 1e-12
    assert abs(float(ll_marker) - float(direct_marker)) < 1e-12


def test_profile_LL_peaks_near_h2hat(bxd_like):
    from bulklmm_tpu import scan

    y = bxd_like["Y"][:, 9]  # trait with interior h2-hat (away from h2->1)
    h2hat = float(scan(y, bxd_like["G"], bxd_like["K"]).h2_null)
    assert 0.05 < h2hat < 0.95
    grid = np.linspace(0.01, 0.99, 99)
    covar = np.ones((bxd_like["n"], 1))
    prof = profile_LL(y, bxd_like["G"], covar, bxd_like["K"], grid, 1)
    peak = grid[np.argmax(np.asarray(prof.ll_list_null))]
    assert abs(peak - h2hat) < 0.02
