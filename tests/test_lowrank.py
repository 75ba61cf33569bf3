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


def test_lowrank_guards():
    Y, G, K = _cohort()
    lr = kinship_lowrank_exact(K, 10)
    with pytest.raises(ValueError, match="null-grid"):
        bl.bulkscan(Y, G, lr, method="alt-grid")
    with pytest.raises(ValueError, match="weights"):
        bl.bulkscan(Y, G, lr, weights=np.ones(K.shape[0]))
