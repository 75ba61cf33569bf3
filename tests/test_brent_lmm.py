"""Brent optimizer and fit_lmm tests (reference test/gridbrent_test.jl,
test/lmm_test.jl)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

import oracle
from bulklmm_tpu.ops.brent import brent_min, gridbrent
from bulklmm_tpu.ops.lmm import fit_lmm
from bulklmm_tpu.ops.rotation import transform_rotation
from bulklmm_tpu.ops.weights import make_weights

rng = np.random.default_rng(5)


def test_brent_quadratic():
    fmin, xmin = brent_min(lambda x: (x - 0.3217) ** 2 + 1.5, 0.0, 1.0)
    assert abs(float(xmin) - 0.3217) < 1e-7
    assert abs(float(fmin) - 1.5) < 1e-12


def test_brent_boundary_minimum():
    _, xmin = brent_min(lambda x: x, 0.0, 1.0)
    assert float(xmin) < 1e-6


def test_gridbrent_multimodal():
    f = lambda x: jnp.sin(8 * x) + 0.5 * x
    _, xmin = gridbrent(f, 0.0, 1.0, 4)
    xs = np.linspace(0, 1, 200001)
    true_x = xs[np.argmin(np.sin(8 * xs) + 0.5 * xs)]
    assert abs(float(xmin) - true_x) < 1e-5  # brute grid spacing is 5e-6


def test_brent_vmappable():
    centers = jnp.asarray([0.1, 0.5, 0.9])
    f = lambda c: brent_min(lambda x: (x - c) ** 2, 0.0, 1.0)[1]
    xs = jax.vmap(f)(centers)
    assert np.allclose(np.asarray(xs), np.asarray(centers), atol=1e-7)


def test_make_weights():
    lam = jnp.asarray([0.5, 1.0, 2.0])
    w = np.asarray(make_weights(0.4, lam))
    delta = 0.4 / 0.6
    assert np.allclose(w, 1.0 / (delta * np.asarray(lam) + 1.0))
    # batched h2
    wb = np.asarray(make_weights(jnp.asarray([0.0, 0.4]), lam))
    assert wb.shape == (2, 3)
    assert np.allclose(wb[0], 1.0)
    assert np.allclose(wb[1], w)


def _simulate(n=120, h2=0.55, seed=3):
    r = np.random.default_rng(seed)
    Z = r.normal(size=(n, 25))
    K = Z @ Z.T / 25
    d = np.sqrt(np.diag(K))
    K = K / np.outer(d, d)
    Lc = np.linalg.cholesky(K + 1e-9 * np.eye(n))
    y = np.sqrt(h2) * (Lc @ r.normal(size=n)) + np.sqrt(1 - h2) * r.normal(size=n)
    return y, K


def test_fit_lmm_matches_scipy_oracle():
    y, K = _simulate()
    rot = transform_rotation(jnp.asarray(y), jnp.zeros((len(y), 0)), K, add_intercept=True)
    for reml in (False, True):
        mine = fit_lmm(rot.y0, rot.X0, rot.lam, reml=reml)
        ref = oracle.fit_lmm(
            np.asarray(rot.y0), np.asarray(rot.X0), np.asarray(rot.lam), reml=reml
        )
        assert abs(float(mine.h2) - ref["h2"]) < 1e-5
        # ell is quadratic-flat at the optimum; h2 localized to ~sqrt(eps)
        # puts independent Brents within ~1e-8 in ell, not machine precision.
        assert abs(float(mine.ell) - ref["ell"]) < 1e-7
        # sigma2 varies linearly in h2 (unlike ell, which is flat at the
        # optimum), and both Brents only localize h2 to ~sqrt(eps); compare
        # sigma2 at the *same* h2 for a tight implementation check.
        assert abs(float(mine.sigma2) - ref["sigma2"]) < 1e-6
        _, sig_at_mine, _, _ = oracle.wls(
            np.asarray(rot.y0),
            np.asarray(rot.X0),
            oracle.make_weights(float(mine.h2), np.asarray(rot.lam)),
            reml=reml,
        )
        assert abs(float(mine.sigma2) - sig_at_mine[0]) < 1e-12


def test_fit_lmm_optim_interval():
    y, K = _simulate(seed=9)
    rot = transform_rotation(jnp.asarray(y), jnp.zeros((len(y), 0)), K, add_intercept=True)
    a = fit_lmm(rot.y0, rot.X0, rot.lam, optim_interval=1)
    b = fit_lmm(rot.y0, rot.X0, rot.lam, optim_interval=5)
    # unimodal here: both find the same optimum; ell can only improve with more intervals
    assert float(b.ell) >= float(a.ell) - 1e-10
    assert abs(float(a.h2) - float(b.h2)) < 1e-5


@pytest.mark.parametrize("seed", [11, 23, 37, 59, 71])
def test_fit_lmm_oracle_many_seeds(seed):
    """Property-style repetition across seeds (reference testHelper runs
    each block 10x, test/testHelpers.jl:1-3)."""
    y, K = _simulate(n=90, h2=0.3 + 0.05 * (seed % 7), seed=seed)
    rot = transform_rotation(jnp.asarray(y), jnp.zeros((len(y), 0)), K, add_intercept=True)
    mine = fit_lmm(rot.y0, rot.X0, rot.lam)
    ref = oracle.fit_lmm(np.asarray(rot.y0), np.asarray(rot.X0), np.asarray(rot.lam))
    assert abs(float(mine.h2) - ref["h2"]) < 1e-5
    assert abs(float(mine.ell) - ref["ell"]) < 1e-7


def test_brent_f32_converges():
    """Dtype-adaptive tolerances: in float32 the convergence test must fire
    (hardcoded f64 tolerances sat below one f32 ulp and never converged)."""
    f = lambda x: (x - jnp.float32(0.3217)) ** 2
    fmin, xmin = brent_min(f, jnp.float32(0.0), jnp.float32(1.0))
    assert xmin.dtype == jnp.float32
    assert abs(float(xmin) - 0.3217) < 2e-4  # sqrt(eps(f32)) ~ 3.5e-4


def test_multimodal_boundary_profile_optim_interval_escape():
    """COMPAT.md #19: a profile likelihood with a global max at h2=0 but
    rising again toward the clamped h2=1 boundary can trap the default
    single-interval Brent at the LOCAL boundary optimum (the reference's
    hazard too — its gridbrent default is also one interval);
    optim_interval=2 engages subintervals and recovers the global
    optimum. The null-GRID engines are immune (they evaluate the grid)."""
    import bulklmm_tpu as bl

    # the exact random-config draw sequence of
    # tests/test_property_sweep.py::_config(73), where the case was found
    rng = np.random.default_rng(73)
    n = int(rng.integers(24, 56))
    p_ = int(rng.integers(20, 60))
    m = int(rng.integers(2, 5))
    int(rng.integers(0, 3))  # c (unused here)
    G = rng.uniform(0, 1, (n, p_))
    K = np.asarray(bl.calc_kinship(G))
    L = np.linalg.cholesky(K + 1e-8 * np.eye(n))
    Y = 0.6 * (L @ rng.normal(size=(n, m))) + rng.normal(size=(n, m))
    y = Y[:, 0]
    # the endpoint guard (gridbrent + host fits) resolves the trap at
    # DEFAULT settings: pure bounded Brent on this profile converged to
    # the local h2=1 boundary (ell(1)=-33.977) and missed the global
    # optimum at the h2=0 endpoint (ell(0)=-33.850)
    assert float(bl.scan(y, G, K).h2_null) < 0.1
    assert float(bl.scan(y, G, K, optim_interval=2).h2_null) < 0.1
    # and the grid engine never had the problem
    bres = bl.bulkscan(y, G, K)
    assert float(bres.h2_null_list[0]) < 0.1
