"""Benchmark suite: every BASELINE.md config, one JSON line per entry.

Reference numbers (16-thread Xeon, reference README.md:198-339):
  single-trait scan 79x7,321 .......... 0.059 s
  single-trait + 1,000 permutations ... 0.079 s
  bulkscan null-grid 35,554x7,321 ..... 2.112 s

Run: python benchmarks/run_all.py [--quick]
Writes benchmarks/results.json and prints one JSON line per config.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BASELINES = {
    "scan_single_trait": 0.059,
    "scan_single_trait_reml": 0.059,  # reference publishes the ML timing
    "scan_perms_1000": 0.079,
    "bulkscan_null_grid": 2.112,
    "bulkscan_null_exact": None,  # reference publishes no number
    "bulkscan_alt_grid": None,
    "scan_alt_exact": None,
}


def synth(n, p, m, seed=2026):
    rng = np.random.default_rng(seed)
    G = rng.uniform(0.0, 1.0, (n, p)).astype(np.float32)
    X = G.astype(np.float64) - 0.5
    K = 2.0 * X @ X.T / p + 0.5
    np.fill_diagonal(K, 1.0)
    Y = rng.normal(size=(n, m)).astype(np.float32)
    return G, K, Y


def timeit(fn, *, repeats=3):
    fn()  # warm-up: compile + absorb async first-fetch latency
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="smaller trait count")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bulklmm_tpu as bl

    n, p = 79, 7321
    m = 4096 if args.quick else 35554
    G, K, Y = synth(n, p, m)
    Gd = jax.device_put(jnp.asarray(G))
    Yd = jax.device_put(jnp.asarray(Y))
    # single-trait input stays HOST numpy (the CSV-user path): the
    # backend-deterministic null fit runs on the host, so a host trait
    # vector costs zero device round-trips; a device-resident trait would
    # add one fetch RTT over the accelerator link
    yd = Y[:, 0]
    jax.block_until_ready((Gd, Yd))

    results = {}

    def record(name, seconds, note=""):
        base = BASELINES.get(name)
        entry = {
            "metric": name,
            "value": round(seconds, 5),
            "unit": "s",
            "vs_baseline": round(base / seconds, 2) if base else None,
        }
        if note:
            entry["note"] = note
        results[name] = entry
        print(json.dumps(entry))

    # NB: every config ends with a device-side checksum + scalar fetch;
    # block_until_ready alone under-reports on asynchronous backends.

    # 1. single-trait null scan
    def f():
        r = bl.scan(yd, Gd, K)
        return float(jnp.sum(r.lod))
    record("scan_single_trait", timeit(f))

    # 1b. single-trait REML scan (BASELINE.json config)
    def f():
        r = bl.scan(yd, Gd, K, reml=True)
        return float(jnp.sum(r.lod))
    record("scan_single_trait_reml", timeit(f))

    # 2. single-trait + 1,000 permutations
    def f():
        r = bl.scan(yd, Gd, K, permutation_test=True, nperms=1000, rndseed=0)
        return float(jnp.sum(r.L_perms))
    record("scan_perms_1000", timeit(f))

    # 3. bulkscan null-grid (the headline)
    def f():
        r = bl.bulkscan(Yd, Gd, K, method="null-grid")
        return float(jnp.sum(r.L))
    record("bulkscan_null_grid", timeit(f), note=f"m={m}")

    # 4. bulkscan null-exact (per-trait Brent)
    def f():
        r = bl.bulkscan(Yd, Gd, K, method="null-exact")
        return float(jnp.sum(r.L))
    record("bulkscan_null_exact", timeit(f), note=f"m={m}")

    # 5. bulkscan alt-grid
    def f():
        r = bl.bulkscan(Yd, Gd, K, method="alt-grid")
        return float(jnp.sum(r.L))
    record("bulkscan_alt_grid", timeit(f), note=f"m={m}")

    # 6. exact per-marker VC scan (the expensive path the grid approximates)
    def f():
        r = bl.scan(yd, Gd, K, assumption="alt")
        return float(jnp.sum(r.lod))
    record("scan_alt_exact", timeit(f))

    # 7. all-trait bulk permutation thresholds (fused Pallas engine)
    def f():
        r = bl.bulkscan_perms(Yd, Gd, K, nperms=1000, rndseed=0)
        return float(jnp.sum(r.maxlods))
    dt = timeit(f, repeats=1)
    results["bulkscan_perms_1000"] = {
        "metric": "bulkscan_perms_1000",
        "value": round(dt, 5),
        "unit": "s",
        "vs_baseline": round(m * BASELINES["scan_perms_1000"] / dt, 1),
        "note": f"m={m} traits x 1000 perms, per-trait genome-wide null "
        f"maxima + FWER thresholds; reference equivalent = {m} sequential "
        f"single-trait perm scans ~{m * 0.079:.0f} s (README.md:229-233 "
        "0.079 s/trait)",
    }
    print(json.dumps(results["bulkscan_perms_1000"]))

    out = Path(__file__).parent / "results.json"
    out.write_text(json.dumps(results, indent=2) + "\n")
    print(f"# wrote {out}")


if __name__ == "__main__":
    main()
