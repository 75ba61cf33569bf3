"""Golden-file parity vs R lmmlite (reference test/scan_test_lmmlite.jl).

The golden CSVs (per-marker beta/sigma2/LOD for BXD trait 7919, ML and REML)
are vendored in the reference mount; the *inputs* (BXD pheno/geno CSVs) are
git-LFS stubs there, so the parity assertions are gated on their presence.
The golden loader itself is always tested.

Reference tolerances: sumSqDiff <= sqrt(1e-9), maxSqDiff <= 1e-9 over 7,321
markers (reference test/scan_test_lmmlite.jl:27-31).
"""

import csv
from pathlib import Path

import numpy as np
import pytest

REF = Path("/root/reference")
GOLDEN_ML = REF / "test/run-lmmlite_R/output/result.lmmlite_ML.csv"
GOLDEN_REML = REF / "test/run-lmmlite_R/output/result.lmmlite_REML.csv"
PHENO = REF / "test/run-lmmlite_R/processed_bxdData/BXDpheno.csv"
GENO = REF / "test/run-lmmlite_R/processed_bxdData/BXDgeno.csv"

TRAIT_7919_COL = 7918  # the golden was generated for 1-based trait 7919


def load_lmmlite_golden(path):
    """Rows: "Null" then one per marker; cols Est_Beta_0, Est_Beta_1,
    Est_Sigma_e, LOD ("NA" -> nan)."""
    with open(path) as fh:
        rows = list(csv.reader(fh))[1:]

    def f(v):
        return float("nan") if v == "NA" else float(v)

    null_row = rows[0]
    markers = rows[1:]
    return {
        "null_beta0": f(null_row[1]),
        "null_sigma2": f(null_row[3]),
        "beta0": np.array([f(r[1]) for r in markers]),
        "beta1": np.array([f(r[2]) for r in markers]),
        "sigma2": np.array([f(r[3]) for r in markers]),
        "lod": np.array([f(r[4]) for r in markers]),
    }


@pytest.mark.skipif(not GOLDEN_ML.is_file(), reason="golden not mounted")
def test_golden_loader():
    g = load_lmmlite_golden(GOLDEN_ML)
    assert g["lod"].shape == (7321,)
    assert np.isfinite(g["lod"]).all()
    assert g["lod"].max() > 1.0  # trait 7919 has real peaks
    r = load_lmmlite_golden(GOLDEN_REML)
    assert r["lod"].shape == (7321,)
    # ML and REML agree on which marker peaks
    assert abs(int(np.argmax(g["lod"])) - int(np.argmax(r["lod"]))) <= 5


@pytest.mark.skipif(
    not (GENO.is_file() and PHENO.is_file() and GOLDEN_ML.is_file()),
    reason="BXD input CSVs are git-LFS stubs in this mount",
)
@pytest.mark.parametrize("reml,golden", [(False, GOLDEN_ML), (True, GOLDEN_REML)])
def test_scan_matches_lmmlite(reml, golden):
    import bulklmm_tpu as bl

    G = bl.read_bxd_geno(GENO)
    Y = bl.read_bxd_pheno(PHENO)
    K = np.asarray(bl.calc_kinship(G))
    res = bl.scan(Y[:, TRAIT_7919_COL], G, K, reml=reml)
    g = load_lmmlite_golden(golden)
    sq = (np.asarray(res.lod) - g["lod"]) ** 2
    assert sq.sum() <= np.sqrt(1e-9)
    assert sq.max() <= 1e-9
