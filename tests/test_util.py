"""Array-utility and LOD-conversion property tests.

Mirrors reference test/util_test.jl: centering/scaling vs manual computation,
zero-divide guards, shuffle multiset preservation, LOD<->p round trips.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bulklmm_tpu.ops import lod as lodmod
from bulklmm_tpu.ops import stats

rng = np.random.default_rng(7)


def test_col_center():
    A = rng.normal(size=(13, 5))
    out = np.asarray(stats.col_center(jnp.asarray(A)))
    assert np.allclose(out, A - A.mean(axis=0, keepdims=True))
    assert np.allclose(out.mean(axis=0), 0.0)


def test_row_center():
    A = rng.normal(size=(7, 9))
    out = np.asarray(stats.row_center(jnp.asarray(A)))
    assert np.allclose(out.mean(axis=1), 0.0)


def test_col_row_divide_and_multiply():
    A = rng.normal(size=(6, 4))
    x = rng.uniform(0.5, 2.0, 4)
    assert np.allclose(np.asarray(stats.col_divide(jnp.asarray(A), x)), A / x)
    r = rng.uniform(0.5, 2.0, 6)
    assert np.allclose(np.asarray(stats.row_divide(jnp.asarray(A), r)), A / r[:, None])
    assert np.allclose(np.asarray(stats.row_multiply(jnp.asarray(A), r)), A * r[:, None])


def test_divide_by_zero_raises():
    A = jnp.asarray(rng.normal(size=(4, 3)))
    with pytest.raises(ValueError):
        stats.col_divide(A, jnp.asarray([1.0, 0.0, 2.0]))
    with pytest.raises(ValueError):
        stats.row_divide(A, jnp.asarray([1.0, 0.0, 2.0, 1.0]))


def test_col_standardize():
    A = rng.normal(size=(20, 6))
    out = np.asarray(stats.col_standardize(jnp.asarray(A)))
    assert np.allclose(out.mean(axis=0), 0.0, atol=1e-12)
    assert np.allclose(out.std(axis=0, ddof=1), 1.0)


def test_shuffle_vector_preserves_multiset():
    x = rng.normal(size=31)
    out = np.asarray(stats.shuffle_vector(jax.random.PRNGKey(0), jnp.asarray(x), 10))
    assert out.shape == (31, 11)
    assert np.allclose(out[:, 0], x)  # column 0 is the original
    for j in range(1, 11):
        assert np.allclose(np.sort(out[:, j]), np.sort(x))
    # shuffles differ from each other
    assert not np.allclose(out[:, 1], out[:, 2])


def test_shuffle_vector_deterministic_under_seed():
    x = jnp.asarray(rng.normal(size=17))
    a = np.asarray(stats.shuffle_vector(jax.random.PRNGKey(3), x, 5))
    b = np.asarray(stats.shuffle_vector(jax.random.PRNGKey(3), x, 5))
    assert np.array_equal(a, b)


def test_lod_p_round_trip():
    from scipy.stats import chi2

    for df in (1, 2, 5):
        lods = np.array([0.5, 1.0, 3.0, 10.0])
        p = lodmod.lod2p(lods, df)
        assert np.allclose(lodmod.p2lod(p, df), lods)
        # lod2log10p agrees with -log10(lod2p)
        assert np.allclose(lodmod.lod2log10p(lods, df), -np.log10(p))
        # device variant agrees for moderate lods
        dev = np.asarray(lodmod.lod2log10p_device(jnp.asarray(lods), df))
        assert np.allclose(dev, -np.log10(p), rtol=1e-6)
        # parity with the chi-square LRT definition (reference util.jl:190-206)
        assert np.allclose(p, chi2.sf(lods * 2 * np.log(10), df))


def test_r2lod():
    r = jnp.asarray([0.0, 0.3, -0.8])
    out = np.asarray(lodmod.r2lod(r, 100))
    assert np.allclose(out, -(100 / 2) * np.log10(1 - np.asarray(r) ** 2))


def test_smallchol_matches_numpy():
    """Unrolled Cholesky/substitution vs numpy for c=1..4, batched operands."""
    import numpy.linalg as la

    from bulklmm_tpu.ops.smallchol import (
        fwd_subst,
        pair_indices,
        residual_sq,
        unrolled_cholesky,
    )

    r = np.random.default_rng(7)
    for c in (1, 2, 3, 4):
        A = r.normal(size=(10, c))
        Gm = A.T @ A + 0.1 * np.eye(c)
        G = {(k, l): jnp.asarray(Gm[k, l]) for k, l in pair_indices(c)}
        L = unrolled_cholesky(G, c)
        L_np = la.cholesky(Gm)
        for i in range(c):
            for k in range(i + 1):
                assert abs(float(L[(i, k)]) - L_np[i, k]) < 1e-12
        rhs = [jnp.asarray(r.normal(size=5)) for _ in range(c)]
        z = fwd_subst(L, rhs, c)
        z_np = la.solve(L_np, np.stack([np.asarray(x) for x in rhs]))
        for k in range(c):
            assert np.allclose(np.asarray(z[k]), z_np[k], atol=1e-12)
    # cancellation floor: never negative
    out = residual_sq(jnp.asarray(1.0), [jnp.asarray(1.0000001)])
    assert float(out) > 0.0


def test_public_api_surface_importable():
    """Every name in __all__ resolves, and the result types / train-step
    alias (exercised indirectly everywhere else) work by name."""
    import bulklmm_tpu as bl
    from bulklmm_tpu import parallel as blp

    for mod in (bl, blp):
        for name in mod.__all__:
            assert getattr(mod, name, None) is not None, name
    assert isinstance(bl.__version__, str) and bl.__version__
    # the driver-facing "one full training step" wrapper
    import jax

    rng = np.random.default_rng(0)
    n, p, m = 24, 16, 6
    G = rng.uniform(0, 1, (n, p))
    K = np.asarray(bl.calc_kinship(G))
    Y = rng.normal(size=(n, m))
    mesh = blp.make_mesh(min(len(jax.devices()), 2))
    res = blp.train_step_sharded(mesh, Y, G, K)
    assert np.asarray(res.L).shape == (p, m)
    assert isinstance(res, bl.BulkScanResult)
