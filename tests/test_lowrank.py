"""Low-rank kinship engine (ops/lowrank.py).

Correctness anchors:
- with k = n (full rank, exact eigenpairs) the Woodbury reformulation is
  algebraically identical to the rotated full-rank engine — LODs and
  per-trait h2 selections must match to solver precision;
- truncated k on a spectrum dominated by its top eigenvalues stays close
  to full rank, and the error shrinks as k grows;
- the randomized constructors recover the top spectrum of the same
  kinship the exact constructor (host eigh) produces.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import bulklmm_tpu as bl
from bulklmm_tpu.ops.lowrank import (
    kinship_lowrank,
    kinship_lowrank_exact,
    kinship_lowrank_from_geno,
)


def _cohort(seed=5, n=60, p=80, m=24, structured=True):
    rng = np.random.default_rng(seed)
    if structured:
        # few dominant ancestry directions -> fast-decaying kinship spectrum
        F = rng.normal(size=(n, 3))
        load = 1.0 / (1.0 + np.exp(-(F @ rng.normal(size=(3, p)) * 0.9)))
        G = rng.binomial(1, load).astype(np.float64)
    else:
        G = rng.uniform(0, 1, (n, p))
    K = np.asarray(bl.calc_kinship(G))
    Y = rng.normal(size=(n, m))
    Y[:, 0] += 0.9 * (G[:, 7] - G[:, 7].mean())
    return Y, G, K


def test_fullrank_equals_rotated_engine():
    Y, G, K = _cohort()
    lr = kinship_lowrank_exact(K, K.shape[0], dtype=jnp.float64)
    ref = bl.bulkscan(Y, G, K, method="null-grid")
    lo = bl.bulkscan(Y, G, lr, method="null-grid")
    assert np.allclose(
        np.asarray(lo.h2_null_list), np.asarray(ref.h2_null_list)
    )
    assert float(jnp.max(jnp.abs(lo.L - ref.L))) < 1e-8


def test_fullrank_equals_rotated_engine_covar_reml():
    Y, G, K = _cohort(seed=9)
    rng = np.random.default_rng(1)
    covar = rng.normal(size=(K.shape[0], 2))
    lr = kinship_lowrank_exact(K, K.shape[0], dtype=jnp.float64)
    ref = bl.bulkscan(Y, G, K, covar, method="null-grid", reml=True,
                      prior_variance=1.0, prior_sample_size=0.1)
    lo = bl.bulkscan(Y, G, lr, covar, method="null-grid", reml=True,
                     prior_variance=1.0, prior_sample_size=0.1)
    assert np.allclose(
        np.asarray(lo.h2_null_list), np.asarray(ref.h2_null_list)
    )
    assert float(jnp.max(jnp.abs(lo.L - ref.L))) < 1e-8


def test_truncation_exact_at_true_rank():
    """K of exact rank r: k = r reproduces the full-rank engine, smaller k
    does not — the truncation error is the spectral tail, nothing else."""
    rng = np.random.default_rng(2)
    n, r = 60, 15
    B = rng.normal(size=(n, r))
    K = B @ B.T
    K *= n / np.trace(K)  # unit average diagonal, kinship-like scale
    Y, G, _ = _cohort(n=n)
    ref = bl.bulkscan(Y, G, K, method="null-grid")
    lo_r = bl.bulkscan(Y, G, kinship_lowrank_exact(K, r, dtype=jnp.float64),
                       method="null-grid")
    lo_5 = bl.bulkscan(Y, G, kinship_lowrank_exact(K, 5, dtype=jnp.float64),
                       method="null-grid")
    err_r = float(jnp.max(jnp.abs(lo_r.L - ref.L)))
    err_5 = float(jnp.max(jnp.abs(lo_5.L - ref.L)))
    assert err_r < 1e-8
    assert err_5 > 10 * max(err_r, 1e-10)


def test_randomized_matches_exact_topk():
    _, G, K = _cohort(seed=13)
    k = 8
    ex = kinship_lowrank_exact(K, k, dtype=jnp.float64)
    rz = kinship_lowrank(K, k, seed=3)
    # well-separated leading eigenvalues are recovered tightly; the flat
    # bulk of the spectrum is only captured as a subspace
    assert np.allclose(np.asarray(rz.lam[:3]), np.asarray(ex.lam[:3]), rtol=1e-3)
    # operator-quality check: K U ~= U diag(lam)
    resid = np.asarray(K) @ np.asarray(rz.U) - np.asarray(rz.U) * np.asarray(rz.lam)
    assert np.linalg.norm(resid, 2) < 0.05 * float(ex.lam[0])


def test_from_geno_matches_explicit_K():
    _, G, K = _cohort(seed=21)
    k = 8
    a = kinship_lowrank(K, k, seed=7)
    b = kinship_lowrank_from_geno(G, k, seed=7)
    assert np.allclose(np.asarray(a.lam), np.asarray(b.lam), rtol=1e-5, atol=1e-7)
    Pa = np.asarray(a.U) @ np.asarray(a.U).T
    Pb = np.asarray(b.U) @ np.asarray(b.U).T
    assert np.max(np.abs(Pa - Pb)) < 1e-4


def test_lowrank_trait_chunk_matches_unchunked():
    Y, G, K = _cohort(seed=17)
    lr = kinship_lowrank_exact(K, 20, dtype=jnp.float64)
    a = bl.bulkscan(Y, G, lr, method="null-grid")
    b = bl.bulkscan(Y, G, lr, method="null-grid", trait_chunk=7)
    assert float(jnp.max(jnp.abs(a.L - b.L))) < 1e-12
    assert np.allclose(np.asarray(a.h2_null_list), np.asarray(b.h2_null_list))


def test_sharded_lowrank_matches_unsharded():
    """8-device (traits x markers) mesh, replicated (n, k) factor: the
    sharded rank-k engine must reproduce the single-device one."""
    import jax

    from bulklmm_tpu.parallel import bulkscan_sharded, make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    Y, G, K = _cohort(seed=31)
    lr = kinship_lowrank_exact(K, 12, dtype=jnp.float64)
    mesh = make_mesh(8, marker_shards=2)
    r_sh = bulkscan_sharded(Y, G, lr, mesh=mesh, method="null-grid",
                            output_pvals=True)
    r_ref = bl.bulkscan(Y, G, lr, method="null-grid", prior_variance=1.0,
                        output_pvals=True)
    assert r_sh.L.shape == r_ref.L.shape
    assert float(jnp.max(jnp.abs(r_sh.L - r_ref.L))) < 1e-9
    assert np.allclose(
        np.asarray(r_sh.h2_null_list), np.asarray(r_ref.h2_null_list)
    )
    assert np.allclose(
        np.asarray(r_sh.log10Pvals_mat), np.asarray(r_ref.log10Pvals_mat)
    )
    # new methods ride the same sharded core
    for meth, tol in (("null-exact", 1e-6), ("alt-grid", 1e-9)):
        s = bulkscan_sharded(Y, G, lr, mesh=mesh, method=meth)
        u = bl.bulkscan(Y, G, lr, method=meth, prior_variance=1.0)
        assert float(jnp.max(jnp.abs(s.L - u.L))) < tol


def test_lowrank_guards():
    Y, G, K = _cohort()
    lr = kinship_lowrank_exact(K, 10)
    with pytest.raises(ValueError, match="method"):
        bl.bulkscan(Y, G, lr, method="banana")
    with pytest.raises(ValueError, match="weights"):
        bl.bulkscan(Y, G, lr, weights=np.ones(K.shape[0]))
    with pytest.raises(ValueError, match="weights"):
        bl.scan(Y[:, 0], G, lr, weights=np.ones(K.shape[0]))
    with pytest.raises(ValueError, match="compat_sqrt_weights"):
        bl.scan(Y[:, 0], G, lr, assumption="alt", compat_sqrt_weights=True)


# ---------------------------------------------------------------------------
# null-exact / alt-grid methods on the rank-k engine
# ---------------------------------------------------------------------------


def test_lowrank_null_exact_matches_fullrank():
    """k = n: the per-trait Brent on the Woodbury likelihood must land on
    the same optimum as the rotated full-rank Brent (both to Brent tol)."""
    Y, G, K = _cohort(seed=41)
    lr = kinship_lowrank_exact(K, K.shape[0], dtype=jnp.float64)
    ref = bl.bulkscan(Y, G, K, method="null-exact")
    lo = bl.bulkscan(Y, G, lr, method="null-exact")
    assert float(jnp.max(jnp.abs(
        jnp.asarray(lo.h2_null_list, dtype=jnp.float64)
        - jnp.asarray(ref.h2_null_list, dtype=jnp.float64)))) < 1e-5
    assert float(jnp.max(jnp.abs(lo.L - ref.L))) < 1e-6


def test_lowrank_alt_grid_matches_fullrank():
    Y, G, K = _cohort(seed=43)
    lr = kinship_lowrank_exact(K, K.shape[0], dtype=jnp.float64)
    ref = bl.bulkscan(Y, G, K, method="alt-grid", engine="xla")
    lo = bl.bulkscan(Y, G, lr, method="alt-grid")
    assert np.allclose(np.asarray(lo.h2_panel), np.asarray(ref.h2_panel))
    assert float(jnp.max(jnp.abs(lo.L - ref.L))) < 1e-8


def test_lowrank_methods_trait_chunked():
    Y, G, K = _cohort(seed=47)
    lr = kinship_lowrank_exact(K, 20, dtype=jnp.float64)
    # alt-grid is a fixed grid -> bit-level agreement; null-exact is a Brent
    # fit whose reduction rounding depends on the batch shape, so chunked
    # optima can differ within Brent tolerance (~1e-8 in h2)
    for meth, tol in (("null-exact", 1e-6), ("alt-grid", 1e-12)):
        a = bl.bulkscan(Y, G, lr, method=meth)
        b = bl.bulkscan(Y, G, lr, method=meth, trait_chunk=7)
        assert float(jnp.max(jnp.abs(a.L - b.L))) < tol


# ---------------------------------------------------------------------------
# single-trait scan on the rank-k engine
# ---------------------------------------------------------------------------


def _single_trait(seed=51):
    rng = np.random.default_rng(seed)
    n, p = 70, 50
    G = rng.choice([0.0, 0.5, 1.0], size=(n, p))
    A = rng.standard_normal((n, n))
    K = A @ A.T / n + 0.5 * np.eye(n)
    K /= np.mean(np.diag(K))
    y = rng.standard_normal(n) + 0.8 * (G[:, 11] - G[:, 11].mean())
    covar = rng.standard_normal((n, 2))
    return y, G, K, covar


def test_scan_lowrank_null_matches_fullrank():
    y, G, K, covar = _single_trait()
    lr = kinship_lowrank_exact(K, K.shape[0], dtype=jnp.float64)
    a = bl.scan(y, G, lr, covar=covar, output_pvals=True)
    b = bl.scan(y, G, jnp.asarray(K), covar=covar, output_pvals=True)
    # the two host Brents optimize different parameterizations of the same
    # likelihood (rotated vs Woodbury), so optima agree to Brent tol only
    assert abs(float(a.h2_null) - float(b.h2_null)) < 1e-7
    assert float(jnp.max(jnp.abs(a.lod - b.lod))) < 1e-7
    assert float(jnp.max(jnp.abs(a.log10pvals - b.log10pvals))) < 1e-6


def test_scan_lowrank_alt_matches_fullrank():
    y, G, K, covar = _single_trait(seed=53)
    lr = kinship_lowrank_exact(K, K.shape[0], dtype=jnp.float64)
    a = bl.scan(y, G, lr, covar=covar, assumption="alt")
    b = bl.scan(y, G, jnp.asarray(K), covar=covar, assumption="alt")
    assert float(jnp.max(jnp.abs(a.lod - b.lod))) < 1e-8
    assert float(jnp.max(jnp.abs(a.h2_each_marker - b.h2_each_marker))) < 1e-5


def test_scan_lowrank_perms():
    """Unpermuted LOD column must equal the full-rank scan; the permuted
    columns are a different (unrotated-basis) but equally valid
    exchangeability scheme — their null max-LOD threshold must agree
    distributionally. Same-seed runs are bit-identical."""
    y, G, K, covar = _single_trait(seed=57)
    lr = kinship_lowrank_exact(K, K.shape[0], dtype=jnp.float64)
    a = bl.scan(y, G, lr, covar=covar, permutation_test=True, nperms=512,
                rndseed=3, output_pvals=True)
    b = bl.scan(y, G, jnp.asarray(K), covar=covar, permutation_test=True,
                nperms=512, rndseed=3)
    assert float(jnp.max(jnp.abs(a.lod - b.lod))) < 1e-10
    qa = float(np.quantile(np.asarray(a.L_perms).max(axis=0), 0.95))
    qb = float(np.quantile(np.asarray(b.L_perms).max(axis=0), 0.95))
    assert abs(qa - qb) < 0.35  # distributional, not elementwise
    assert a.L_perms.shape == (G.shape[1], 512)
    assert a.log10Pvals_perms.shape == a.L_perms.shape
    a2 = bl.scan(y, G, lr, covar=covar, permutation_test=True, nperms=512,
                 rndseed=3)
    assert float(jnp.max(jnp.abs(a.L_perms - a2.L_perms))) == 0.0


def test_scan_perms_lite_lowrank_route():
    y, G, K, covar = _single_trait(seed=59)
    lr = kinship_lowrank_exact(K, K.shape[0], dtype=jnp.float64)
    r = bl.scan_perms_lite(y, G, covar, lr, nperms=64, rndseed=1)
    rf = bl.scan_perms_lite(y, G, covar, jnp.asarray(K), nperms=64, rndseed=1)
    assert r.L_perms.shape == (G.shape[1], 64)
    assert float(jnp.max(jnp.abs(r.lod - rf.lod))) < 1e-7  # Brent tol


def test_scan_lowrank_profile_ll_matches_fullrank():
    y, G, K, covar = _single_trait(seed=61)
    lr = kinship_lowrank_exact(K, K.shape[0], dtype=jnp.float64)
    ra, prof_a = bl.scan(y, G, lr, covar=covar, profile_ll=True, marker_id=7)
    rb, prof_b = bl.scan(y, G, jnp.asarray(K), covar=covar, profile_ll=True,
                         marker_id=7)
    assert float(jnp.max(jnp.abs(prof_a[0] - prof_b[0]))) < 1e-10
    assert float(jnp.max(jnp.abs(prof_a[1] - prof_b[1]))) < 1e-10


def test_lowrank_woodbury_quadforms_nonnegative_f32():
    """Regression: Woodbury-form totals (yty + sum(dm1 Q^2), marker norms,
    Gram diagonals) can round NEGATIVE in f32 for traits/markers (nearly)
    in span(U) as h2 -> 1 (dm1 -> -1); unclamped, sigma2 floors at
    dtype-tiny and the log-likelihood explodes to ~1e35, hijacking the h2
    fit (or NaN-ing the LODs). ops/lowrank.py::_wquad clamps every such
    total at zero."""
    import jax.numpy as jnp

    from bulklmm_tpu.ops.lowrank import (
        LowRankKinship, _parts_kwargs, _shared_parts, _trait_side_parts,
        fit_h2_lowrank, grid_null_ell_lowrank,
    )
    from bulklmm_tpu.utils.config import FAST32

    rng = np.random.default_rng(0)
    n, k, m = 2048, 8, 24
    U = np.linalg.qr(rng.normal(size=(n, k)))[0]
    lam = np.linspace(3.0, 0.5, k)
    # traits EXACTLY in span(U), large scale -> yty - ||Q||^2 cancels to
    # f32 rounding noise, negative for ~half the columns without the clamp
    Y = (U @ rng.normal(size=(k, m))) * 1e3
    C = np.ones((n, 1))

    lr = LowRankKinship(
        U=jnp.asarray(U, jnp.float32), lam=jnp.asarray(lam, jnp.float32)
    )
    kw = _parts_kwargs(FAST32)
    parts = {
        **_shared_parts(jnp.asarray(C, jnp.float32), lr, **kw),
        **_trait_side_parts(
            jnp.asarray(Y, jnp.float32), jnp.asarray(C, jnp.float32), lr,
            **kw,
        ),
    }
    lam_k = lr.lam
    # near-1 h2 probes: the danger zone
    # h2 -> 1 probes: without the clamp this configuration reaches
    # ell ~ 1e31 at h2 >= 1 - 1e-6 (verified pre-fix)
    grid = jnp.asarray(
        [0.9, 0.999, 0.99999, 0.999999, 0.9999999], jnp.float32
    )
    ells = np.asarray(grid_null_ell_lowrank(
        parts, lam_k, grid, (1.0, 0.0), n=n
    ))
    assert np.isfinite(ells).all()
    # no exploding +1e35 likelihoods from a tiny-floored sigma2
    assert np.max(ells) < 1e9, np.max(ells)
    h2s = np.asarray(fit_h2_lowrank(parts, lam_k, (1.0, 0.0), n=n))
    assert np.isfinite(h2s).all() and (h2s >= 0).all() and (h2s <= 1).all()
