"""End-to-end BXD workflow — the reference README's tour (reference
README.md:99-361), start to finish on this framework.

Uses the real BXD marker map / trait annotations / kinship golden from the
reference mount when present; the expression matrix (git-LFS stub there) is
replaced by a synthetic stand-in simulated against the REAL kinship, so every
step below runs genuinely.

  python examples/bxd_workflow.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bulklmm_tpu as bl

REF = Path("/root/reference")


def load_or_simulate():
    he = REF / "test/ref_data_for_tests/kinship_ref.he"
    gmap = REF / "data/bxdData/gmap.csv"
    rng = np.random.default_rng(2026)
    if he.is_file():
        K = bl.read_helium_matrix(he)  # the real 79x79 BXD spleen kinship
        n = K.shape[0]
        print(f"loaded reference kinship golden: {K.shape}")
    else:
        n = 79
        K = None
    p = len(bl.read_gmap(gmap).locus) if gmap.is_file() else 7321
    # synthetic genotype probabilities consistent in scale with BXD
    G = rng.uniform(0, 1, (n, p))
    if K is None:
        K = np.asarray(bl.calc_kinship(G))
    # traits simulated against the real kinship with varying heritability
    m = 2000
    Lc = np.linalg.cholesky(K + 1e-8 * np.eye(n))
    h2s = rng.uniform(0.1, 0.9, m)
    Y = np.sqrt(h2s) * (Lc @ rng.normal(size=(n, m))) + np.sqrt(1 - h2s) * rng.normal(
        size=(n, m)
    )
    Y[:, 0] = 0.4 * Y[:, 0] + 2.2 * (G[:, 1234] - G[:, 1234].mean())  # a planted QTL
    return G, K, Y


def main():
    G, K, Y = load_or_simulate()

    # 1. kinship from genotypes (here: already have the golden) ------------
    dec = bl.decompose_kinship(K)  # decompose once, reuse everywhere

    # 2. single-trait scan (reference README.md:190-215) -------------------
    res = bl.scan(Y[:, 0], G, dec)
    print(f"scan: h2_null={float(res.h2_null):.4f}  sigma2_e={float(res.sigma2_e):.4f}")
    print(f"      peak LOD {float(res.lod.max()):.2f} at marker {int(np.argmax(res.lod))} "
          f"(planted QTL at 1234, LOD {float(res.lod[1234]):.2f})")

    # 3. permutation thresholds (reference README.md:217-255) --------------
    perm = bl.scan(Y[:, 0], G, dec, permutation_test=True, nperms=1000, rndseed=0)
    thr = bl.get_thresholds(perm.L_perms, [0.10, 0.05])
    print(f"perm thresholds: alpha=0.10 -> {thr.thrs[0]:.3f}, alpha=0.05 -> {thr.thrs[1]:.3f}")
    print(f"planted QTL significant: {bool(res.lod.max() > thr.thrs[1])}")

    # 4. profile likelihood at the peak (reference README.md:281-303) ------
    marker = int(np.argmax(res.lod))
    covar = np.ones((len(K), 1))
    prof = bl.profile_LL(Y[:, 0], G, covar, K, np.arange(0.05, 1.0, 0.05), marker + 1)
    print(f"profile-LL grid points: {prof.ll_list_null.shape[0]}")

    # 5. bulk scan, all traits (reference README.md:334-361) ---------------
    out = bl.bulkscan(Y, G, dec)  # null-grid default
    print(f"bulkscan L: {out.L.shape}, mean h2 = {float(np.mean(out.h2_null_list)):.3f}")

    # 6. exact and alt variants --------------------------------------------
    exact = bl.bulkscan_null(Y[:, :64], G, dec)
    alt = bl.bulkscan_alt_grid(Y[:, :64], G, dec)
    print(f"null-exact vs null-grid max|dLOD| (64 traits): "
          f"{float(np.max(np.abs(exact.L - out.L[:, :64]))):.4f}")
    print(f"alt-grid h2_panel shape: {alt.h2_panel.shape}")

    print("workflow complete")


if __name__ == "__main__":
    main()
