"""Randomized cross-engine consistency sweep.

For a handful of random configurations (shapes, covariates, weights,
REML), the fast bulk engines must reproduce the single-trait reference
path under h2-injection (the reference's own consistency strategy,
test/bulkscan_test.jl:86-107), and the rank-k engine at full rank must
match the rotated engine. Catches configuration-dependent regressions the
fixed-shape suites can miss.
"""

import numpy as np
import pytest

import bulklmm_tpu as bl


def _config(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(24, 56))
    p = int(rng.integers(20, 60))
    m = int(rng.integers(2, 5))
    c = int(rng.integers(0, 3))
    G = rng.uniform(0, 1, (n, p))
    K = np.asarray(bl.calc_kinship(G))
    L = np.linalg.cholesky(K + 1e-8 * np.eye(n))
    Y = 0.6 * (L @ rng.normal(size=(n, m))) + rng.normal(size=(n, m))
    covar = rng.normal(size=(n, c)) if c else None
    weights = (
        rng.uniform(0.5, 2.0, size=n) if rng.integers(0, 2) else None
    )
    reml = bool(rng.integers(0, 2))
    return G, K, Y, covar, weights, reml


@pytest.mark.parametrize("seed", [11, 23, 37, 51, 101, 115])
def test_bulk_engines_match_single_trait_random_config(seed):
    G, K, Y, covar, weights, reml = _config(seed)
    # single-trait fits give the h2s to inject into the grid
    h2s, lods = [], []
    for j in range(Y.shape[1]):
        r = bl.scan(Y[:, j], G, K, covar, weights=weights, reml=reml)
        h2s.append(float(r.h2_null))
        lods.append(np.asarray(r.lod))
    grid = np.asarray(sorted(set(h2s)))
    res = bl.bulkscan(
        Y, G, K, covar, weights=weights, reml=reml,
        method="null-grid", h2_grid=grid,
    )
    for j in range(Y.shape[1]):
        np.testing.assert_allclose(
            np.asarray(res.L)[:, j], lods[j], atol=1e-6,
            err_msg=f"seed={seed} trait={j}",
        )
    # null-exact agrees without injection
    res2 = bl.bulkscan(
        Y, G, K, covar, weights=weights, reml=reml, method="null-exact"
    )
    for j in range(Y.shape[1]):
        np.testing.assert_allclose(
            np.asarray(res2.L)[:, j], lods[j], atol=5e-5,
            err_msg=f"null-exact seed={seed} trait={j}",
        )


@pytest.mark.parametrize("seed", [7, 19])
def test_lowrank_full_rank_matches_rotated_random_config(seed):
    from bulklmm_tpu.ops.lowrank import kinship_lowrank_exact

    G, K, Y, covar, _, reml = _config(seed)
    lr = kinship_lowrank_exact(K, K.shape[0])  # k = n: exact
    a = bl.bulkscan(Y, G, K, covar, reml=reml)
    b = bl.bulkscan(Y, G, lr, covar, reml=reml)
    np.testing.assert_allclose(
        np.asarray(a.L), np.asarray(b.L), atol=1e-6,
        err_msg=f"seed={seed}",
    )


@pytest.mark.parametrize("seed", [13, 29])
def test_perm_engines_match_random_config(seed):
    """Randomized shapes through every permutation composition: the fused
    kernel (interpret), the mesh engine, and streamed x sharded must all
    reproduce the single-device XLA sweep exactly (same shuffles, same
    whitening basis)."""
    from bulklmm_tpu.parallel import bulkscan_perms_sharded, make_mesh

    rng = np.random.default_rng(seed)
    G, K, Y, covar, _, _ = _config(seed)
    p = G.shape[1]
    a = bl.bulkscan_perms(Y, G, K, covar, nperms=13, rndseed=seed)
    A = np.asarray(a.maxlods)
    b = bl.bulkscan_perms(
        Y, G, K, covar, nperms=13, rndseed=seed, engine="pallas",
        interpret=True, tile_p=16,
        trait_chunk=int(rng.integers(1, Y.shape[1] + 1)),
    )
    assert np.max(np.abs(A - np.asarray(b.maxlods))) < 1e-5, "pallas"
    mesh = make_mesh(4, marker_shards=2)
    c = bulkscan_perms_sharded(
        Y, G, K, covar, mesh=mesh, nperms=13, rndseed=seed
    )
    assert np.max(np.abs(A - np.asarray(c.maxlods))) < 1e-9, "sharded"
    d = bl.bulkscan_perms_streamed(
        Y, G, K, covar, nperms=13, rndseed=seed,
        marker_block=int(rng.integers(5, p + 4)), mesh=mesh,
    )
    assert np.max(np.abs(A - np.asarray(d.maxlods))) < 1e-9, "streamed+mesh"


@pytest.mark.parametrize("seed", [61, 73, 89])
def test_masked_engines_match_complete_case_random_config(seed):
    """Randomized missing-data property: under random shapes / covariates
    / weights / REML and random per-trait missingness, every masked bulk
    engine equals the complete-case single-trait scan per trait
    (round-5 missing='mask' composed with the reference's own
    h2-injection consistency strategy)."""
    G, K, Y, covar, weights, reml = _config(seed)
    rng = np.random.default_rng(seed + 1000)
    Ym = np.asarray(Y, dtype=np.float64).copy()
    n, m = Ym.shape
    for j in range(m):
        if rng.integers(0, 2):
            k = int(rng.integers(1, max(2, n // 6)))
            Ym[rng.choice(n, size=k, replace=False), j] = np.nan

    h2s, lods = [], []
    for j in range(m):
        r = np.isfinite(Ym[:, j])
        res = bl.scan(
            Ym[r, j], G[r], K[np.ix_(r, r)],
            None if covar is None else covar[r],
            weights=None if weights is None else weights[r], reml=reml,
        )
        h2s.append(float(res.h2_null))
        lods.append(np.asarray(res.lod))
    # traits whose Brent fit lands on the clamped h2 = 1 boundary are
    # outside the injection trick's premise (the grid evaluates the
    # CLAMPED likelihood there while Brent stops at the boundary —
    # COMPAT.md #10); exclude them like the reference's own consistency
    # tests implicitly do by never fitting boundary traits
    ok = [j for j in range(m) if h2s[j] < 0.999]
    if not ok:
        pytest.skip("all traits hit the h2=1 boundary for this seed")
    grid = np.asarray(sorted({h2s[j] for j in ok}))
    res = bl.bulkscan(
        Ym, G, K, covar, weights=weights, reml=reml,
        method="null-grid", h2_grid=grid, missing="mask",
    )
    for j in ok:
        np.testing.assert_allclose(
            np.asarray(res.L)[:, j], lods[j], atol=1e-6,
            err_msg=f"seed={seed} trait={j}",
        )
    res2 = bl.bulkscan(
        Ym, G, K, covar, weights=weights, reml=reml,
        method="null-exact", missing="mask",
    )
    for j in ok:
        np.testing.assert_allclose(
            np.asarray(res2.L)[:, j], lods[j], atol=5e-5,
            err_msg=f"seed={seed} trait={j}",
        )
