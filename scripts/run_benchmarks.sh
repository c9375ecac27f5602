#!/usr/bin/env bash
# Benchmark driver (reference scripts/run_benchmarks.sh twin).
#
# The reference's argbash script exposes --asm / --multi_threads and runs
# the four criterion benches (transfer / mint / freeze / batch_verification).
# The cap-tpu analogues: the MSM engine choice (CAP_MSM=signed|windowed —
# the "asm" lever) and the pipelined multi-proof mode (the "multi-threads"
# lever).  Results print as one JSON line per bench; the depth-26 criterion
# grid (CSV, reference bench_utils schema) runs with --grid.
#
# Usage: scripts/run_benchmarks.sh [--windowed] [--multi_proof] [--grid]
set -euo pipefail
cd "$(dirname "$0")/.."

MODES=(transfer mint freeze batch_verify)
for arg in "$@"; do
    case "$arg" in
        --windowed)     export CAP_MSM=windowed ;;
        --multi_proof)  MODES=(throughput) ;;
        --grid)         MODES=(grid) ;;
        -h|--help)
            echo "usage: $0 [--windowed] [--multi_proof] [--grid]"; exit 0 ;;
        *) echo "unknown flag: $arg" >&2; exit 1 ;;
    esac
done

for mode in "${MODES[@]}"; do
    echo "== CAP_BENCH=$mode =="
    CAP_BENCH="$mode" python bench.py
done
