#!/usr/bin/env bash
# Full test sweep (reference scripts/run_tests_full.sh twin).
#
# The reference re-runs the whole crate once per curve feature
# (bls12_381 / bn254 / bls12_377).  cap-tpu binds all three CapConfig
# curves in one process (cap_tpu/config.py), so the default suite already
# covers them: tests/test_multicurve.py proves and verifies a TurboPlonk
# relation over BLS12-377 and BLS12-381 next to the BN254 device path.
# This script additionally opts into the slow TPU-gated end-to-end suite
# when a chip is attached (CAP_TPU_RUN_SLOW=1 keeps the TPU backend —
# tests/conftest.py).
set -euo pipefail
cd "$(dirname "$0")/.."
export PYTHONHASHSEED=0

# full sweep reports ALL failures (no -x — ADVICE r3: the reference's full
# run reports the entire crate's results; fast-fail stays in run_tests.sh)
echo "== slow-CPU tier: real proofs for all three note types =="
CAP_RUN_SLOW_CPU=1 python -m pytest tests/test_real_notes_slow.py -q
# (writes data/real_notes_bn254.pkl, consumed by the default suite's real
# mixed-type batch-verify test)

echo "== default suite (bn254 + bls12_377 + bls12_381, CPU mesh) =="
python -m pytest tests/ -q

echo "== slow TPU-gated end-to-end suite =="
if python - <<'EOF'
import jax
ok = any(d.platform not in ("cpu",) for d in jax.devices())
raise SystemExit(0 if ok else 1)
EOF
then
    CAP_TPU_RUN_SLOW=1 python -m pytest tests/test_e2e_slow.py -x -q
else
    echo "no accelerator attached; skipping (run on a TPU host for the full sweep)"
fi
