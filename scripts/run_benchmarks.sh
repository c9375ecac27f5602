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
MODE_FLAG=""
for arg in "$@"; do
    case "$arg" in
        --windowed)     export CAP_MSM=windowed ;;
        --multi_proof|--grid)
            # mutually exclusive mode selectors (ADVICE r3): passing both
            # would silently run only the last one
            if [[ -n "$MODE_FLAG" ]]; then
                echo "error: $MODE_FLAG and $arg are mutually exclusive" >&2
                exit 1
            fi
            MODE_FLAG="$arg"
            [[ "$arg" == --multi_proof ]] && MODES=(throughput) || MODES=(grid)
            ;;
        -h|--help)
            echo "usage: $0 [--windowed] [--multi_proof | --grid]"
            echo "  --windowed     use the windowed MSM engine in any mode"
            echo "  --multi_proof  run ONLY the pipelined-throughput bench"
            echo "  --grid         run ONLY the depth-26 criterion grid"
            exit 0 ;;
        *) echo "unknown flag: $arg" >&2; exit 1 ;;
    esac
done

for mode in "${MODES[@]}"; do
    echo "== CAP_BENCH=$mode =="
    CAP_BENCH="$mode" python bench.py
done
