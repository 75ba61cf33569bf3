"""Probe: is the fused bulk-perm kernel MXU-pass-bound or HBM-bound?

Round-3 PERF.md attributed the 2.7 s BXD bulk-perm sweep to the (mb, n, K)
pre-shuffled-residual HBM round-trip (~18 GB) and named the in-kernel
shuffle as the remaining ~2x lever. This probe tests the competing theory:
the kernel's num dot contracts over n = 79 samples (padded to the MXU's
128 quantum -> 62% per-pass efficiency), so its padded speed-of-light at
f32 HIGHEST (6 bf16 passes) is already ~2.4 s — MXU passes, not HBM.

Measures (checksum-fetch methodology, docs/PERF.md):
  1. square-GEMM f32 HIGHEST ceiling (control; round-3 measured 28.5 TF/s)
  2. the kernel-shaped dot (512, 80) @ (80, 1024) at HIGHEST — padded
     contraction; theory predicts ~62% of (1)
  3. same with n = 128 (full contraction quantum) — theory predicts ~(1)
  4. (2) at Precision.HIGH (bf16x3) — theory predicts ~2x (2)
  5. HBM stream rate for an Sperm-sized tensor (gather + read)

Run: python benchmarks/probe_perm_kernel.py

MEASURED OUTCOME (v5e, 2026-08, docs/PERF.md round-4): the square probe
reads 22.5-28 TF/s; the XLA rect probes read only 5-9 TF/s and are nearly
precision-INsensitive (HIGHEST 5.1 vs DEFAULT 6.0) — a fori-loop of one
small dot is latency/pipeline-bound, so XLA micro-probes CANNOT stand in
for the Mosaic kernel, whose grid pipelines the same dot shape at
~17 TF/s nominal. The decisive experiment ran on the kernel itself:
swapping its dots 6 passes -> 3 (manual bf16 splits) moved the full BXD
sweep 2.43 s -> 1.33 s, i.e. ~0.37 s per bf16 pass x 6 ~ 2.2 s of pure
MXU — the kernel is ~90% MXU-pass-bound and the round-3 "HBM-bound"
hypothesis is refuted (the Sperm stream probe reads the full gather +
round-trip at tens of ms). Kept for reproducibility of those numbers.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def timed_fetch(fn, *args, repeats=5):
    out = fn(*args)
    float(jnp.sum(out))  # compile + absorb async first-fetch
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        s = float(jnp.sum(out))  # fetch closes the timed region
        best = min(best, time.perf_counter() - t0)
        del s
    return best


def probe_square(size=8192, precision="highest", iters=8):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((size, size)), jnp.float32)
    b = jnp.asarray(rng.random((size, size)), jnp.float32)

    @jax.jit
    def chain(a, b):
        def body(i, b):
            return jnp.matmul(a, b, precision=precision) / float(size)
        return jax.lax.fori_loop(0, iters, body, b)

    dt = timed_fetch(chain, a, b)
    return 2.0 * size**3 * iters / dt / 1e12


def probe_rect(m, n, k, precision, iters=20000):
    """Chained (m, n) @ (n, k) dots — the kernel's num-dot shape."""
    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.random((m, n)), jnp.float32)
    S = jnp.asarray(rng.random((n, k)), jnp.float32)

    @jax.jit
    def chain(X, S):
        def body(i, S):
            out = jnp.matmul(X, S, precision=precision)  # (m, k)
            # feed the output back so no iteration can be deduped; the
            # slice + scale is VPU noise next to the dot
            return S + out[:S.shape[0], :] * 1e-30
        return jax.lax.fori_loop(0, iters, body, S)

    dt = timed_fetch(chain, X, S)
    return 2.0 * m * n * k * iters / dt / 1e12


def probe_sperm_stream(m=35554, n=80, K=1024, chunk=512):
    """Gather-materialize + stream an Sperm-sized tensor chunk by chunk:
    the HBM cost the in-kernel shuffle would remove."""
    rng = np.random.default_rng(2)
    wrn = jnp.asarray(rng.random((n, m)), jnp.float32)
    idx = jnp.asarray(
        np.stack([rng.permutation(n) for _ in range(K)]), jnp.int32
    )

    @partial(jax.jit, static_argnames=("ms",))
    def one_chunk(wrn, idx, *, ms):
        blk = jax.lax.dynamic_slice_in_dim(wrn, ms, chunk, axis=1)
        Sperm = jnp.transpose(blk[idx], (2, 1, 0))  # (chunk, n, K)
        return jnp.sum(Sperm, axis=(1, 2))  # forces full materialize+read

    # warm one shape
    float(jnp.sum(one_chunk(wrn, idx, ms=0)))
    t0 = time.perf_counter()
    tot = 0.0
    for ms in range(0, (m // chunk) * chunk, chunk):
        tot += float(jnp.sum(one_chunk(wrn, idx, ms=0)))
    dt = time.perf_counter() - t0
    nbytes = (m // chunk) * chunk * n * K * 4
    return dt, nbytes / dt / 1e9


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", flush=True)

    sq = probe_square()
    print(json.dumps({"probe": "square8192_f32_highest", "tflops": round(sq, 2)}), flush=True)

    r80_hi = probe_rect(512, 80, 1024, "highest")
    print(json.dumps({"probe": "rect_512x80x1024_highest", "tflops": round(r80_hi, 2),
                      "pct_of_square": round(100 * r80_hi / sq, 1)}), flush=True)

    r128_hi = probe_rect(512, 128, 1024, "highest")
    print(json.dumps({"probe": "rect_512x128x1024_highest", "tflops": round(r128_hi, 2),
                      "pct_of_square": round(100 * r128_hi / sq, 1)}), flush=True)

    r80_med = probe_rect(512, 80, 1024, "high")
    print(json.dumps({"probe": "rect_512x80x1024_high", "tflops": round(r80_med, 2),
                      "vs_highest": round(r80_med / r80_hi, 2)}), flush=True)

    r80_def = probe_rect(512, 80, 1024, "default")
    print(json.dumps({"probe": "rect_512x80x1024_default", "tflops": round(r80_def, 2),
                      "vs_highest": round(r80_def / r80_hi, 2)}), flush=True)

    dt, gbs = probe_sperm_stream()
    print(json.dumps({"probe": "sperm_gather_stream_35554x80x1024",
                      "seconds": round(dt, 3), "GBps": round(gbs, 1)}), flush=True)

    # theory line: BXD num-dot nominal FLOPs / measured padded-dot rate
    flops = 2.0 * 35554 * 7321 * 80 * 1025
    print(json.dumps({
        "theory": "bxd_num_dot_SOL_seconds",
        "highest": round(flops / (r80_hi * 1e12), 2),
        "high": round(flops / (r80_med * 1e12), 2),
    }), flush=True)


if __name__ == "__main__":
    main()
