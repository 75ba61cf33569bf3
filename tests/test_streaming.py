"""Marker-streamed bulk scans (models/streaming.py).

The streamed engine must reproduce the in-memory engines exactly: each
block runs the identical kernels, the per-trait null fit is
marker-independent, and the final partial block is padded with zero
markers whose results are dropped.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import bulklmm_tpu as bl
from bulklmm_tpu.ops.lowrank import kinship_lowrank_exact


@pytest.fixture(scope="module")
def cohort():
    rng = np.random.default_rng(23)
    n, p, m = 50, 53, 11  # p deliberately not a multiple of the block size
    G = rng.choice([0.0, 0.5, 1.0], size=(n, p))
    K = np.asarray(bl.calc_kinship(G))
    Y = rng.normal(size=(n, m))
    Y[:, 2] += 0.8 * (G[:, 19] - G[:, 19].mean())
    covar = rng.normal(size=(n, 2))
    return G, K, Y, covar


def test_streamed_null_grid_matches_inmemory(cohort):
    G, K, Y, covar = cohort
    ref = bl.bulkscan(Y, G, K, covar, method="null-grid")
    st = bl.bulkscan_streamed(Y, G, K, covar, method="null-grid",
                              marker_block=16)
    assert st.L.shape == ref.L.shape
    assert np.max(np.abs(st.L - np.asarray(ref.L))) < 1e-6  # f32 out array
    assert np.allclose(np.asarray(st.h2_null_list),
                       np.asarray(ref.h2_null_list))


def test_streamed_null_exact_matches_inmemory(cohort):
    G, K, Y, covar = cohort
    ref = bl.bulkscan(Y, G, K, method="null-exact")
    st = bl.bulkscan_streamed(Y, G, K, method="null-exact", marker_block=16)
    assert np.max(np.abs(st.L - np.asarray(ref.L))) < 1e-5
    assert np.max(np.abs(np.asarray(st.h2_null_list)
                         - np.asarray(ref.h2_null_list))) < 1e-6


def test_streamed_alt_grid_matches_inmemory(cohort):
    G, K, Y, covar = cohort
    ref = bl.bulkscan(Y, G, K, covar, method="alt-grid", engine="xla")
    st = bl.bulkscan_streamed(Y, G, K, covar, method="alt-grid",
                              marker_block=16)
    assert np.max(np.abs(st.L - np.asarray(ref.L))) < 1e-6
    assert np.allclose(st.h2_panel, np.asarray(ref.h2_panel))


def test_streamed_reml_pvals_and_memmap(cohort, tmp_path):
    G, K, Y, covar = cohort
    ref = bl.bulkscan(Y, G, K, covar, method="null-grid", reml=True,
                      output_pvals=True)
    out = np.memmap(tmp_path / "lods.dat", dtype=np.float32, mode="w+",
                    shape=(G.shape[1], Y.shape[1]))
    st = bl.bulkscan_streamed(Y, G, K, covar, method="null-grid", reml=True,
                              output_pvals=True, marker_block=16, out=out)
    assert st.L is out
    assert np.max(np.abs(out - np.asarray(ref.L))) < 1e-6
    assert np.max(np.abs(st.log10Pvals_mat
                         - np.asarray(ref.log10Pvals_mat))) < 1e-5


def test_streamed_lowrank_all_methods(cohort):
    G, K, Y, covar = cohort
    lr = kinship_lowrank_exact(K, 20, dtype=jnp.float64)
    for meth, tol in (("null-grid", 1e-6), ("null-exact", 1e-5),
                      ("alt-grid", 1e-6)):
        ref = bl.bulkscan(Y, G, lr, covar, method=meth)
        st = bl.bulkscan_streamed(Y, G, lr, covar, method=meth,
                                  marker_block=16)
        assert np.max(np.abs(st.L - np.asarray(ref.L))) < tol, meth


def test_streamed_guards(cohort):
    G, K, Y, covar = cohort
    with pytest.raises(ValueError, match="method"):
        bl.bulkscan_streamed(Y, G, K, method="banana")
    bad = np.empty((3, 3), dtype=np.float32)
    with pytest.raises(ValueError, match="shape"):
        bl.bulkscan_streamed(Y, G, K, out=bad)
    with pytest.raises(ValueError, match="engine"):
        bl.bulkscan_streamed(Y, G, K, engine="palas")
    with pytest.raises(ValueError, match="alt-grid"):
        bl.bulkscan_streamed(Y, G, K, method="null-grid", engine="pallas")
    with pytest.raises(ValueError, match="shape"):
        bl.bulkscan_streamed(Y, G, K, output_pvals=True, out_pvals=bad)
    lr = kinship_lowrank_exact(K, 10, dtype=jnp.float64)
    with pytest.raises(ValueError, match="LowRank"):
        bl.bulkscan_streamed(Y, G, lr, method="alt-grid", engine="pallas")


def test_streamed_pvals_blockwise_memmap(cohort, tmp_path):
    """P-values are computed per block on the host (never a full-matrix
    device round-trip) and can land in a caller-provided memmap."""
    G, K, Y, covar = cohort
    p, m = G.shape[1], Y.shape[1]
    ref = bl.bulkscan(Y, G, K, covar, method="alt-grid", engine="xla",
                      output_pvals=True)
    pv = np.memmap(tmp_path / "pv.dat", dtype=np.float32, mode="w+",
                   shape=(p, m))
    st = bl.bulkscan_streamed(Y, G, K, covar, method="alt-grid",
                              output_pvals=True, out_pvals=pv,
                              marker_block=16)
    assert st.log10Pvals_mat is pv
    assert np.max(np.abs(pv - np.asarray(ref.log10Pvals_mat))) < 1e-5
    # low-rank route too
    lr = kinship_lowrank_exact(K, 20, dtype=jnp.float64)
    ref_lr = bl.bulkscan(Y, G, lr, covar, output_pvals=True)
    st_lr = bl.bulkscan_streamed(Y, G, lr, covar, output_pvals=True,
                                 marker_block=16)
    assert np.max(np.abs(st_lr.log10Pvals_mat
                         - np.asarray(ref_lr.log10Pvals_mat))) < 1e-5
