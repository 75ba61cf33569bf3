"""WLS tests: vs hand-rolled weighted OLS, QR/Cholesky agreement, prior and
REML formula parity with the oracle (reference test/wls_basic_test.jl,
test/wls_results_test.jl)."""

import jax.numpy as jnp
import numpy as np

import oracle
from bulklmm_tpu.ops.wls import resid, rss, wls, wls_multivar

rng = np.random.default_rng(11)


def _data(n=50, p=4, q=3):
    X = np.concatenate([np.ones((n, 1)), rng.normal(size=(n, p - 1))], axis=1)
    B = rng.normal(size=(p, q))
    Y = X @ B + rng.normal(size=(n, q)) * 0.3
    w = rng.uniform(0.4, 2.5, n)
    return X, Y, w


def test_wls_matches_manual_weighted_ols():
    X, Y, w = _data()
    out = wls(jnp.asarray(Y), jnp.asarray(X), jnp.asarray(w))
    sw = np.sqrt(w)
    bhat = np.linalg.lstsq(X * sw[:, None], Y * sw[:, None], rcond=None)[0]
    assert np.allclose(np.asarray(out.b), bhat, atol=1e-10)


def test_qr_cholesky_agree():
    X, Y, w = _data()
    a = wls(jnp.asarray(Y), jnp.asarray(X), jnp.asarray(w), method="qr")
    b = wls(jnp.asarray(Y), jnp.asarray(X), jnp.asarray(w), method="cholesky")
    assert np.allclose(np.asarray(a.b), np.asarray(b.b), atol=1e-9)
    assert np.allclose(np.asarray(a.ell), np.asarray(b.ell), atol=1e-9)
    assert np.allclose(np.asarray(a.sigma2), np.asarray(b.sigma2), atol=1e-11)


def test_wls_formulas_vs_oracle_all_modes():
    X, Y, w = _data()
    for reml in (False, True):
        for prior in ((0.0, 0.0), (1.0, 0.0), (0.5, 3.0)):
            mine = wls(jnp.asarray(Y), jnp.asarray(X), jnp.asarray(w), prior, reml=reml)
            _, s2, ell, rss0 = oracle.wls(Y, X, w, prior, reml=reml)
            assert np.allclose(np.asarray(mine.sigma2), s2, rtol=1e-12)
            assert np.allclose(np.asarray(mine.ell), ell, rtol=1e-12)
            assert np.allclose(np.asarray(mine.rss), rss0, rtol=1e-12)


def test_wls_multivar_matches_columnwise_wls():
    X, Y, w = _data()
    multi = wls_multivar(jnp.asarray(Y), jnp.asarray(X), jnp.asarray(w), (0.5, 2.0), reml=True)
    for j in range(Y.shape[1]):
        single = wls(jnp.asarray(Y[:, j]), jnp.asarray(X), jnp.asarray(w), (0.5, 2.0), reml=True)
        assert np.allclose(np.asarray(multi.ell[j]), np.asarray(single.ell[0]))
        assert np.allclose(np.asarray(multi.b[:, j]), np.asarray(single.b[:, 0]))


def test_resid_and_rss():
    X, Y, _ = _data()
    r = np.asarray(resid(jnp.asarray(Y), jnp.asarray(X)))
    # residuals orthogonal to design
    assert np.allclose(X.T @ r, 0.0, atol=1e-9)
    assert np.allclose(np.asarray(rss(jnp.asarray(Y), jnp.asarray(X))), np.sum(r * r, axis=0))
    # vector input keeps vector shape
    r1 = resid(jnp.asarray(Y[:, 0]), jnp.asarray(X))
    assert r1.ndim == 1
    # cholesky path agrees
    r2 = np.asarray(resid(jnp.asarray(Y), jnp.asarray(X), method="cholesky"))
    assert np.allclose(r, r2, atol=1e-9)


def test_true_beta_recovery_heteroskedastic():
    """Simulated heteroskedastic data: weighted fit recovers beta better than
    unweighted (reference test/wls_results_test.jl:89-117)."""
    r = np.random.default_rng(123)
    n, reps = 800, 30
    beta = np.array([1.0, -2.0, 0.5])
    err_w, err_u = 0.0, 0.0
    for _ in range(reps):
        X = np.concatenate([np.ones((n, 1)), r.normal(size=(n, 2))], axis=1)
        var = r.uniform(0.05, 5.0, n)
        y = X @ beta + r.normal(size=n) * np.sqrt(var)
        w = 1.0 / var
        bw = np.asarray(wls(jnp.asarray(y), jnp.asarray(X), jnp.asarray(w)).b)[:, 0]
        bu = np.asarray(wls(jnp.asarray(y), jnp.asarray(X), jnp.ones(n)).b)[:, 0]
        err_w += np.sum((bw - beta) ** 2)
        err_u += np.sum((bu - beta) ** 2)
        assert np.allclose(bw, beta, atol=0.3)
    # inverse-variance weighting is the BLUE: lower mean squared error
    assert err_w < err_u


def test_wls_ell_matches_wls():
    """The solve-free likelihood path must agree with full wls in every mode."""
    import itertools

    from bulklmm_tpu.ops.wls import wls, wls_ell

    r = np.random.default_rng(11)
    y = jnp.asarray(r.normal(size=(40, 6)))
    X = jnp.asarray(np.column_stack([np.ones(40), r.normal(size=(40, 3))]))
    w = jnp.asarray(r.uniform(0.2, 2.0, 40))
    for reml, prior in itertools.product((False, True), ((0.0, 0.0), (1.0, 3.0))):
        full = wls(y, X, w, prior, reml=reml)
        ell, sigma2 = wls_ell(y, X, w, prior, reml=reml)
        assert np.allclose(np.asarray(ell), np.asarray(full.ell), atol=1e-10)
        assert np.allclose(np.asarray(sigma2), np.asarray(full.sigma2), atol=1e-12)
