"""Data I/O tests: CSV reader semantics (reference src/readData.jl) and the
Helium golden-file reader against the reference's kinship golden."""

import os
from pathlib import Path

import numpy as np
import pytest

from bulklmm_tpu import io as bio

REF = Path("/root/reference")
KINSHIP_HE = REF / "test/ref_data_for_tests/kinship_ref.he"
GMAP = REF / "data/bxdData/gmap.csv"
PHENOCOVAR = REF / "data/bxdData/phenocovar.csv"


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return p


def test_read_geno_prob(tmp_path):
    f = _write(
        tmp_path,
        "geno.csv",
        "id,m1_a,m1_b,m2_a,m2_b\nBXD1,0.9,0.1,0.2,0.8\nBXD2,0.5,0.5,0.7,0.3\n",
    )
    gp = bio.read_geno_prob(f)
    assert gp.shape == (2, 4)
    assert np.allclose(gp[0], [0.9, 0.1, 0.2, 0.8])


def test_read_geno_prob_exclude_complements(tmp_path):
    f = _write(
        tmp_path,
        "geno.csv",
        "id,m1_a,m1_b,m2_a,m2_b\nBXD1,0.9,0.1,0.2,0.8\nBXD2,0.5,0.5,0.7,0.3\n",
    )
    gp = bio.read_geno_prob_exclude_complements(f)
    # keeps columns 1 and 3 (1-based odd) of the prob block
    assert gp.shape == (2, 2)
    assert np.allclose(gp, [[0.9, 0.2], [0.5, 0.7]])


def test_read_bxd_pheno_drops_id_and_sex(tmp_path):
    f = _write(
        tmp_path,
        "pheno.csv",
        "id,t1,t2,sex\nBXD1,1.5,2.5,1\nBXD2,3.5,4.5,0\n",
    )
    ph = bio.read_bxd_pheno(f)
    assert ph.shape == (2, 2)
    assert np.allclose(ph, [[1.5, 2.5], [3.5, 4.5]])


def test_read_bxd_geno_takes_even_columns(tmp_path):
    f = _write(
        tmp_path,
        "geno.csv",
        "id,m1_a,m1_b,m2_a,m2_b\nBXD1,0.9,0.1,0.2,0.8\nBXD2,0.5,0.5,0.7,0.3\n",
    )
    g = bio.read_bxd_geno(f)
    assert g.shape == (2, 2)
    assert np.allclose(g, [[0.9, 0.2], [0.5, 0.7]])


def test_write_read_roundtrip(tmp_path):
    data = np.asarray([[1.0, 2.0], [3.0, 4.0]])
    out = tmp_path / "out.csv"
    bio.write_to_file(data, out)
    back = np.asarray(
        [row.split(",") for row in out.read_text().strip().splitlines()],
        dtype=np.float64,
    )
    assert np.allclose(back, data)


def test_gemma_geno_converter(tmp_path):
    f = _write(
        tmp_path,
        "geno.csv",
        "id,m1_pA,m1_pB,m2_pA,m2_pB\nBXD1,0.9,0.1,0.2,0.8\nBXD2,0.5,0.5,0.7,0.3\n",
    )
    out = tmp_path / "gemma.csv"
    res = bio.transform_bxd_geno_to_gemma(f, out)
    assert res.shape == (2, 5)  # 2 markers x (name, A, B, 2 individuals)
    assert res[0, 0] == "m1"  # pair suffix stripped
    assert res[0, 1] == "A" and res[0, 2] == "B"
    assert np.allclose(res[:, 3:].astype(float), [[1.8, 1.0], [0.4, 1.4]])


@pytest.mark.skipif(not KINSHIP_HE.is_file(), reason="reference golden not mounted")
def test_helium_reader_on_reference_kinship_golden():
    K = bio.read_helium_matrix(KINSHIP_HE)
    assert K.shape == (79, 79)
    assert np.allclose(np.diag(K), 1.0)
    assert np.allclose(K, K.T)
    assert K.min() > 0.0 and K.max() <= 1.0
    # spot-check the first off-diagonal value decoded from the raw bytes
    assert abs(K[0, 1] - 0.4687748986091472) < 1e-15


@pytest.mark.skipif(not GMAP.is_file(), reason="reference gmap not mounted")
def test_gmap_loader():
    mm = bio.read_gmap(GMAP)
    assert len(mm.locus) == len(mm.cm) == len(mm.chromosome)
    assert len(mm.locus) > 7000  # 7,321 BXD markers


@pytest.mark.skipif(not PHENOCOVAR.is_file(), reason="reference phenocovar not mounted")
def test_phenocovar_loader():
    pc = bio.read_phenocovar(PHENOCOVAR)
    ncols = {len(v) for v in pc.values()}
    assert len(ncols) == 1
    assert ncols.pop() > 35000  # 35,554 traits


def test_rotated_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    y0, X0, lam = rng.normal(size=(10, 1)), rng.normal(size=(10, 5)), rng.uniform(0, 2, 10)
    f = tmp_path / "rot.npz"
    bio.save_rotated(f, y0, X0, lam, n_covars=2)
    y0b, X0b, lamb, nc = bio.load_rotated(f)
    assert nc == 2
    assert np.allclose(y0b, y0) and np.allclose(X0b, X0) and np.allclose(lamb, lam)


GEMMA_LODS = REF / "data/bxdData/GEMMA_BXDTrait1112/gemma_lod_1112.txt"


@pytest.mark.skipif(not GEMMA_LODS.is_file(), reason="reference GEMMA file not mounted")
def test_gemma_lod_loader():
    lods = bio.read_gemma_lods(GEMMA_LODS)
    assert lods.shape == (7321,)  # one LOD per BXD marker
    assert np.isfinite(lods).all() and lods.max() > 4.0  # trait 1112 peak
