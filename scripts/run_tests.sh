#!/usr/bin/env bash
# Default test suite (reference scripts/run_tests.sh twin).
#
# The reference runs `cargo test --release --features bn254` with integer
# overflow checks forced on (RUSTFLAGS="-C overflow-checks=on").  The
# cap-tpu analogue of that hardening is built in unconditionally: host
# amounts use checked int arithmetic (structs.py), decoded points get
# subgroup checks, and the field layers assert canonical limbs in their
# round-trip tests.  The suite runs on a virtual 8-device CPU mesh
# (tests/conftest.py) so it needs no TPU.
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONHASHSEED=0   # stable pallas compile-cache keys (see bench.py)
exec python -m pytest tests/ -x -q --durations=10 "$@"
