#!/usr/bin/env bash
# Coverage report (reference scripts/test_coverage.sh twin).
#
# The reference uses grcov over the cargo test binaries, ignoring
# errors.rs / bin / parameters.rs / bench_utils (pure glue).  We mirror
# the same ignore set with coverage.py when it is available; this image
# ships without it (and installs are disallowed), so the script degrades
# to a clear message rather than pip-installing.
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONHASHSEED=0

OMIT="cap_tpu/errors.py,cap_tpu/gen_parameters.py,cap_tpu/parameters.py,cap_tpu/bench_utils.py"

if python -c "import coverage" 2>/dev/null; then
    python -m coverage run --source=cap_tpu --omit="$OMIT" -m pytest tests/ -x -q
    python -m coverage html -d build/coverage
    python -m coverage report | tail -20
    echo "Coverage report available at build/coverage/index.html."
else
    echo "coverage.py is not installed in this image (pip installs are"
    echo "disallowed here).  On a normal host: pip install coverage, then"
    echo "re-run this script.  Falling back to running the plain suite:"
    python -m pytest tests/ -x -q
fi
