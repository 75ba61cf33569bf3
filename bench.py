"""Flagship benchmark: BXD-scale null-grid bulkscan on one chip.

Reference headline number (BASELINE.md): BulkLMM.jl computes the full
35,554-trait x 7,321-marker BXD LOD matrix (null-grid, h2 grid 0:0.1:0.9) in
2.112 s on a 16-thread Xeon (reference README.md:336-339). This script runs
the same-shape problem on synthetic BXD-scale data and prints one JSON line:

  {"metric": ..., "value": seconds, "unit": "s", "vs_baseline": speedup}

``vs_baseline`` > 1 means faster than the reference.

Mode: BALANCED precision (f64 rotation + likelihood/grid math, f32 HIGHEST
MXU GEMMs and f32 kernel combines, accurate-f32 polynomial log) — max
|LOD error| vs the f64 oracle is 7.7e-6, inside the 1e-5 reference-parity
bar, with no trait chunking needed. FAST32 runs the same scan in ~48 ms
(~44x) at 1.4e-5; MIXED (f64 combines) gives 6.8e-6 at ~90 ms.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

BASELINE_S = 2.112
N, P, M = 79, 7321, 35554


def synth_bxd(n=N, p=P, m=M, seed=2026):
    rng = np.random.default_rng(seed)
    G = rng.uniform(0.0, 1.0, (n, p)).astype(np.float32)
    X = G - 0.5
    K = (2.0 * X.astype(np.float64) @ X.astype(np.float64).T / p + 0.5)
    np.fill_diagonal(K, 1.0)
    Y = rng.normal(size=(n, m)).astype(np.float32)
    return G, K, Y


def main():
    import jax

    jax.config.update("jax_enable_x64", True)  # MIXED needs f64 available
    import jax.numpy as jnp

    from bulklmm_tpu import bulkscan
    from bulklmm_tpu.utils.config import BALANCED

    G, K, Y = synth_bxd()
    # Data resident in accelerator memory before timing — the analog of the
    # reference's benchmark, which times compute with both matrices already
    # in Julia RAM (reference README.md:336-339; CSV load is excluded there
    # too). The timed path covers the host eigendecomposition, the fused
    # rotation + grid-fit + LOD device program, and result materialization.
    Gd = jax.device_put(jnp.asarray(G))
    Yd = jax.device_put(jnp.asarray(Y))
    Gd.block_until_ready()
    Yd.block_until_ready()

    def run():
        t0 = time.perf_counter()
        res = bulkscan(Yd, Gd, K, method="null-grid", precision=BALANCED)
        # Force completion with a device-side checksum + scalar fetch:
        # block_until_ready alone under-reports on asynchronous backends.
        checksum = float(jnp.sum(res.L))
        return time.perf_counter() - t0, checksum

    run()  # compile warm-up (first fetch also absorbs async compile latency)
    times = [run()[0] for _ in range(5)]
    best = min(times)

    print(
        json.dumps(
            {
                "metric": "bulkscan_null_grid_bxd_35554x7321",
                "value": round(best, 4),
                "unit": "s",
                "vs_baseline": round(BASELINE_S / best, 2),
            }
        )
    )

    if "--assert" in sys.argv:
        # regression gate (VERDICT r4 item 7): fail if the flagship
        # number leaves its committed band (benchmarks/bands.json)
        band = json.loads(
            (Path(__file__).parent / "benchmarks" / "bands.json")
            .read_text()
        )["bench_flagship"]
        if best > band["max_seconds"]:
            print(
                f"# PERF REGRESSION: {best:.4f}s exceeds band "
                f"{band['max_seconds']:.4f}s (committed "
                f"{band['committed']:.4f}s x {band['band']})"
            )
            sys.exit(1)
        print(f"# perf gate: inside band ({band['max_seconds']:.4f}s)")


if __name__ == "__main__":
    main()
