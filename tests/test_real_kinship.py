"""Real BXD kinship parity tests.

The mount carries the real 79x79 BXD kinship in TWO independent reference
artifacts: the Helium binary golden (reference test/ref_data_for_tests/
kinship_ref.he, asserted exactly equal to a freshly-computed kinship in
reference test/kinship_test.jl:5-7) and the plain CSV the R lmmlite harness
consumed (reference test/run-lmmlite_R/processed_bxdData/BXDkinship.csv).
Cross-checking them validates our Helium reader against an artifact we never
parsed with it; running the scan engines on the real kinship's eigen-spectrum
(near-zero tail at n=79) stresses the make_weights / abs-guard paths that
synthetic SPD fixtures do not — this is as close to the intent of the
reference's kinship/golden tests as the mount allows (the BXD pheno/geno
matrices themselves are LFS stubs).
"""

from pathlib import Path

import numpy as np
import pytest

import bulklmm_tpu as bl
from bulklmm_tpu.utils.config import EXACT64

import oracle

REF = Path("/root/reference")
HELIUM = REF / "test/ref_data_for_tests/kinship_ref.he"
CSV = REF / "test/run-lmmlite_R/processed_bxdData/BXDkinship.csv"

pytestmark = pytest.mark.skipif(
    not (HELIUM.is_file() and CSV.is_file()),
    reason="reference kinship artifacts not mounted",
)


@pytest.fixture(scope="module")
def real_k():
    return np.asarray(bl.read_helium_matrix(HELIUM), dtype=np.float64)


@pytest.fixture(scope="module")
def real_k_data(real_k):
    """Genotype panel + traits simulated against the REAL kinship spectrum."""
    rng = np.random.default_rng(79)
    n = real_k.shape[0]
    p, m = 150, 8
    G = rng.uniform(0.0, 1.0, (n, p))
    lam, U = np.linalg.eigh(real_k)
    # exact K^1/2 through the same spectrum the engines will see (the real
    # BXD kinship is PSD but with a near-zero eigenvalue tail)
    Khalf = U @ np.diag(np.sqrt(np.clip(lam, 0.0, None))) @ U.T
    h2s = rng.uniform(0.15, 0.85, m)
    Y = np.sqrt(h2s) * (Khalf @ rng.normal(size=(n, m))) + np.sqrt(1 - h2s) * (
        rng.normal(size=(n, m))
    )
    # Planted effects strong enough to clear permutation thresholds. A large
    # marker effect makes the NULL profile likelihood genuinely bimodal on
    # the real spectrum (a boundary global optimum at h2=0 beats the interior
    # mode) — exactly the hazard gridbrent's subintervals guard against
    # (reference src/gridbrent.jl:9-24), so oracle-parity tests here run the
    # optimizers with 16 subintervals on both sides.
    eff0 = G[:, 23] - G[:, 23].mean()
    # the moderate (0.9x) effect leaves the interior mode alive -> bimodal;
    # the strong (2.0x) one is used for detectable permutation peaks
    y_bimodal = Y[:, 0] + 0.9 * eff0
    Y[:, 0] += 2.0 * eff0
    Y[:, 1] += 1.5 * (G[:, 101] - G[:, 101].mean())
    return dict(K=real_k, G=G, Y=Y, lam=lam, y_bimodal=y_bimodal)


def test_helium_reader_matches_lmmlite_csv(real_k):
    """Two independent reference artifacts must agree: the Helium golden and
    the CSV the R harness used (they were produced from the same kinship)."""
    csv_k = np.loadtxt(CSV, delimiter=",")
    assert csv_k.shape == real_k.shape == (79, 79)
    assert np.max(np.abs(csv_k - real_k)) <= 1e-14


def test_real_spectrum_properties(real_k):
    """The real kinship's spectrum has the near-zero tail that motivates the
    abs()/clamp guards (reference src/bulkscan_helpers.jl:138)."""
    lam = np.linalg.eigvalsh(real_k)
    assert lam.min() > -1e-7  # PSD up to roundoff (no warning path)
    assert lam.min() < 1e-2 * lam.max()  # genuinely ill-conditioned tail
    assert np.allclose(np.diag(real_k), 1.0)


def test_scan_null_oracle_parity_real_k(real_k_data):
    d = real_k_data
    y = d["Y"][:, 0]
    res = bl.scan(y, d["G"], d["K"], optim_interval=16, precision=EXACT64)
    ora = oracle.scan_null(y, d["G"], d["K"], ninterval=16)
    assert abs(float(res.h2_null) - ora["h2_null"]) < 1e-6
    assert np.max(np.abs(np.asarray(res.lod) - ora["lod"])) < 1e-7


def test_multimodal_profile_guard_real_k(real_k_data):
    """A moderate planted effect makes the null profile bimodal on the real
    spectrum. Through round 4 this test demonstrated the hazard: one Brent
    interval converged to the interior LOCAL optimum while 16 subintervals
    found the boundary global one. Round 5's lower-endpoint guard
    (ops/brent.py::gridbrent, COMPAT.md #19) closes that gap at DEFAULT
    settings — both interval counts now return the global mode — while
    pure interior Brent (no endpoint candidate) still demonstrates the
    bimodality by landing on the other, strictly-lower-likelihood mode."""
    from bulklmm_tpu.models.bulkscan import grid_null_ell
    from bulklmm_tpu.ops.brent import brent_min
    from bulklmm_tpu.ops.rotation import transform_rotation
    from bulklmm_tpu.ops.weights import make_weights
    from bulklmm_tpu.ops.wls import wls_ell
    import jax.numpy as jnp

    d = real_k_data
    y = d["y_bimodal"][:, None]
    res1 = bl.scan(y[:, 0], d["G"], d["K"], optim_interval=1, precision=EXACT64)
    res16 = bl.scan(y[:, 0], d["G"], d["K"], optim_interval=16, precision=EXACT64)
    # endpoint guard: one interval now finds the same global mode as 16
    assert abs(float(res1.h2_null) - float(res16.h2_null)) < 1e-6

    rot = transform_rotation(jnp.asarray(y), jnp.ones((y.shape[0], 1)), d["K"],
                             add_intercept=False)

    def neg_ll(h2):
        return -wls_ell(
            rot.y0, rot.X0, make_weights(h2, rot.lam), (0.0, 0.0)
        )[0][0]

    # pure interior Brent (what the pre-guard default did): a DIFFERENT,
    # lower-likelihood mode — the profile is genuinely bimodal
    _, x_interior = brent_min(neg_ll, 0.0, 1.0, dtype=rot.lam.dtype)
    assert abs(float(x_interior) - float(res1.h2_null)) > 0.05
    ells = grid_null_ell(
        rot.y0, rot.X0, rot.lam,
        jnp.asarray([float(x_interior), float(res1.h2_null)]), (0.0, 0.0),
    )
    assert float(ells[1, 0]) > float(ells[0, 0])  # the guard's mode wins


def test_scan_null_reml_oracle_parity_real_k(real_k_data):
    d = real_k_data
    y = d["Y"][:, 2]
    res = bl.scan(y, d["G"], d["K"], reml=True, optim_interval=16, precision=EXACT64)
    ora = oracle.scan_null(y, d["G"], d["K"], reml=True, ninterval=16)
    assert abs(float(res.h2_null) - ora["h2_null"]) < 1e-6
    assert np.max(np.abs(np.asarray(res.lod) - ora["lod"])) < 1e-7


def test_scan_alt_oracle_parity_real_k(real_k_data):
    d = real_k_data
    y = d["Y"][:, 1]
    G = d["G"][:, :40]  # alt path fits per-marker VC; keep the loop modest
    res = bl.scan(y, G, d["K"], assumption="alt", optim_interval=16,
                  precision=EXACT64)
    ora = oracle.scan_alt(y, G, d["K"], ninterval=16)
    assert np.max(np.abs(np.asarray(res.lod) - ora["lod"])) < 1e-6
    assert np.max(np.abs(np.asarray(res.h2_each_marker) - ora["h2_each_marker"])) < 1e-4


def test_bulkscan_engines_consistent_real_k(real_k_data):
    """null-exact columns == single-trait scan (the reference's own
    consistency bar, test/bulkscan_test.jl:60-80, SSE <= 1e-7), and null-grid
    == null-exact when each trait's exact h2 is injected into the grid
    (test/bulkscan_test.jl:86-107)."""
    d = real_k_data
    res_exact = bl.bulkscan(d["Y"], d["G"], d["K"], method="null-exact",
                            optim_interval=16, precision=EXACT64)
    for j in range(d["Y"].shape[1]):
        res1 = bl.scan(d["Y"][:, j], d["G"], d["K"],
                       prior_variance=1.0, optim_interval=16, precision=EXACT64)
        sse = float(np.sum((np.asarray(res_exact.L[:, j]) - np.asarray(res1.lod)) ** 2))
        assert sse <= 1e-7, (j, sse)

    grid = np.unique(np.concatenate([
        np.arange(0.0, 0.91, 0.1), np.asarray(res_exact.h2_null_list)
    ]))
    res_grid = bl.bulkscan(d["Y"], d["G"], d["K"], method="null-grid",
                           h2_grid=grid, precision=EXACT64)
    assert np.max(np.abs(np.asarray(res_grid.L) - np.asarray(res_exact.L))) < 1e-7


def test_bulkscan_alt_grid_loose_real_k(real_k_data):
    """alt-grid vs exact scan(alt): the reference's loose bars
    (test/bulkscan_test.jl:113-137): mean |dh2| <= 0.05, mean dLOD^2 <= 0.01."""
    d = real_k_data
    G = d["G"][:, :40]
    grid = np.arange(0.0, 0.96, 0.05)
    res = bl.bulkscan(d["Y"][:, :3], G, d["K"], method="alt-grid",
                      h2_grid=grid, precision=EXACT64)
    for j in range(3):
        ora = oracle.scan_alt(d["Y"][:, j], G, d["K"], prior=(1.0, 0.0),
                              ninterval=16)
        dh2 = np.abs(np.asarray(res.h2_panel[:, j]) - ora["h2_each_marker"])
        dlod = (np.asarray(res.L[:, j]) - ora["lod"]) ** 2
        assert dh2.mean() <= 0.05, (j, dh2.mean())
        assert dlod.mean() <= 0.01, (j, dlod.mean())


def test_permutation_scan_real_k(real_k_data):
    """Permutation scan on the real spectrum: column 0 equals the plain null
    scan, same-seed runs are bit-identical, thresholds are ordered."""
    d = real_k_data
    y = d["Y"][:, 0]
    res = bl.scan(y, d["G"], d["K"], permutation_test=True, nperms=256,
                  rndseed=11, precision=EXACT64)
    plain = bl.scan(y, d["G"], d["K"], precision=EXACT64)
    assert np.max(np.abs(np.asarray(res.lod) - np.asarray(plain.lod))) < 1e-9

    res2 = bl.scan(y, d["G"], d["K"], permutation_test=True, nperms=256,
                   rndseed=11, precision=EXACT64)
    assert np.array_equal(np.asarray(res.L_perms), np.asarray(res2.L_perms))

    thr = bl.get_thresholds(res.L_perms, [0.10, 0.05, 0.01])
    t = np.asarray(thr.thrs)
    assert np.all(np.diff(t) > 0)  # stricter alpha -> higher threshold
    assert float(np.max(res.lod)) > t[0]  # the planted effect is detectable


def test_boundary_h2_finite_on_real_spectrum(real_k_data):
    """h2 at the grid boundary (0.9 with near-zero eigenvalues) must stay
    finite through make_weights' guards."""
    d = real_k_data
    res = bl.bulkscan(d["Y"], d["G"], d["K"], h2_grid=np.array([0.0, 0.9]),
                      precision=EXACT64)
    assert np.isfinite(np.asarray(res.L)).all()
