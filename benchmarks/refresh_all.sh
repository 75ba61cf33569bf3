#!/bin/bash
# Refresh every judge-facing TPU artifact at HEAD, in dependency order.
# Run on a machine with the TPU tunnel up; each step is independently
# timeout-guarded (a killed compile job blocks the remote compiler for
# later runs — let steps finish). Takes ~20-40 min cold (first compiles).
set -x
cd "$(dirname "$0")/.."

# 1. cross-backend accuracy sweep (writes benchmarks/tpu_validation_results.txt)
timeout 3600 python benchmarks/tpu_validation.py || exit 1

# 2. BASELINE.md configs (writes benchmarks/results.json) + perf gate:
#    nonzero exit if any config regresses past benchmarks/bands.json
timeout 3600 python benchmarks/run_all.py --check || exit 1

# 3. headline JSON line (driver format) + flagship perf gate
timeout 1200 python bench.py --assert || exit 1

# 4. biobank-scale perms: full-rank Pallas streaming + rank-k Woodbury
timeout 1800 python benchmarks/biobank.py --perms 256 --perm-traits 128
timeout 1800 python benchmarks/biobank.py --lowrank 1024 --perms 256 --perm-traits 128

echo "refresh complete — update docs/PERF.md tables if numbers moved"
