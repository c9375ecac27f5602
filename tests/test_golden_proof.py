"""Golden proof-byte regression pins (VERDICT r4 item 7).

Two fast default-suite guards against silent transcript/kernel/serde
regressions — the class of bug that otherwise needs a 17-minute suite or
a TPU run to surface:

  1. a REAL TurboPlonk proof of a small fixed circuit, proven from
     `test_rng()` on every run, byte-compared against a committed fixture
     (guards prover math + Fiat-Shamir transcript + serialization);
  2. the committed real CAP notes (data/real_notes_bn254.pkl) proof bytes
     pinned by digest (guards the stored fixtures + note serde).

When a change is MEANT to break proof bytes (e.g. round 4's spec
alignment), regenerate intentionally:  CAP_REGEN_GOLDEN=1 pytest
tests/test_golden_proof.py  — the diff then shows up in git.

Reference pattern: fixed-seed fixtures throughout the reference suite
(`ark_std::test_rng()`, tests/examples.rs).
"""

import hashlib
import os

import pytest

from cap_tpu.plonk import prover
from cap_tpu.plonk.circuit import PlonkCircuit
from cap_tpu.plonk.srs import universal_setup
from cap_tpu.utils.rng import test_rng

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "data", "golden")
REGEN = os.environ.get("CAP_REGEN_GOLDEN") == "1"


@pytest.fixture(scope="module", autouse=True)
def host_msm():
    old = os.environ.get("CAP_MSM")
    os.environ["CAP_MSM"] = "host"
    yield
    if old is None:
        os.environ.pop("CAP_MSM", None)
    else:
        os.environ["CAP_MSM"] = old


def _chain_circuit(x0: int, rounds: int = 40):
    c = PlonkCircuit()
    x = c.load(x0)
    for i in range(rounds):
        x5 = c.mul(c.mul(c.mul(x, x), c.mul(x, x)), x)
        x = c.lc_with_constant([x5, x, c.one, c.one], [1, 1, 0, 0], i)
    c.set_variable_public(x)
    return c


def _check_or_regen(name: str, data: bytes):
    path = os.path.join(GOLDEN_DIR, name)
    if REGEN or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(path, "wb") as f:
            f.write(data)
        if not REGEN:
            pytest.skip(f"golden fixture {name} created; commit it")
        return
    want = open(path, "rb").read()
    assert data == want, (
        f"{name}: proof bytes changed ({hashlib.sha256(data).hexdigest()[:16]}"
        f" vs {hashlib.sha256(want).hexdigest()[:16]}). If intentional, "
        "regenerate with CAP_REGEN_GOLDEN=1 and commit."
    )


def test_golden_small_plonk_proof():
    rng = test_rng()
    c = _chain_circuit(12345)
    fin = c.finalize_for_arithmetization()
    srs = universal_setup(fin.n + 2, rng)
    pk, _vk = prover.preprocess(srs, c)
    proof = prover.prove(rng, pk, c.witness_values, c.public_input(),
                         ext_msg=b"golden")
    _check_or_regen("plonk_small_proof.bin", proof.to_bytes())


def test_golden_real_note_proof_digests():
    """Digest-pin the committed real CAP note proofs (mint/transfer/freeze
    fixtures behind the default suite's real batch-verify)."""
    import pickle

    path = os.path.join(os.path.dirname(__file__), "..", "data",
                        "real_notes_bn254.pkl")
    if not os.path.exists(path):
        pytest.skip("no committed real notes")
    with open(path, "rb") as f:
        blob = f.read()
    _check_or_regen("real_notes_digest.txt",
                    hashlib.sha256(blob).hexdigest().encode())
