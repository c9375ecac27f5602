"""One REAL CAP-note proof in the default CPU suite (VERDICT r2 item 7).

A real mint note (domain 2^14, the smallest note circuit) is proven with
the native-C++ host Pippenger (CAP_MSM=host) and verified with real
pairings — the reference runs real SNARKs through every integration
scenario (tests/examples.rs:1654-1750), and this is the default-suite
anchor proving the whole stack end to end on CPU (~2 min; the full
scenario matrix stays TPU-gated in test_e2e_slow.py).

Note-level cross-wiring negatives run against the same REAL proof
(reference src/proof/transfer.rs:599-760: wrong vk / wrong root /
tampered proof / tampered public field all fail).
"""

import dataclasses
import os

import pytest

from cap_tpu.errors import (
    FailedAssetCodeVerificationError,
    FailedSnarkError,
    InvalidParameterError,
)
from cap_tpu.utils.rng import test_rng

DEPTH = 2


@pytest.fixture(scope="module")
def real_mint():
    old = os.environ.get("CAP_MSM")
    os.environ["CAP_MSM"] = "host"
    try:
        from cap_tpu.proof import mint as mproof, universal_setup_for_staging
        from cap_tpu.utils.params_builder import MintParamsBuilder

        rng = test_rng()
        srs = universal_setup_for_staging(2**14 + 2, "data")
        pk, vk = mproof.preprocess(srs, DEPTH)
        b = MintParamsBuilder(rng, DEPTH, with_viewer=True)
        note, *_ = b.build_mint_note(pk)
        yield note, vk, b, mproof, srs
    finally:
        if old is None:
            os.environ.pop("CAP_MSM", None)
        else:
            os.environ["CAP_MSM"] = old


def test_real_mint_prove_verify(real_mint):
    note, vk, b, _, _ = real_mint
    note.verify(vk, b.tree.root)  # raises on failure


def test_real_mint_wrong_root(real_mint):
    note, vk, b, _, _ = real_mint
    with pytest.raises(InvalidParameterError):
        note.verify(vk, (b.tree.root + 1) % (2**200))


def test_real_mint_wrong_vk(real_mint):
    """A verifying key for a different tree depth must reject the proof."""
    note, _, b, mproof, srs = real_mint
    _, vk3 = mproof.preprocess(srs, DEPTH + 1)
    with pytest.raises((FailedSnarkError, InvalidParameterError)):
        note.verify(vk3, b.tree.root)


def test_real_mint_tampered_proof(real_mint):
    """Swapping two proof commitments must fail the pairing check."""
    note, vk, b, _, _ = real_mint
    pf = note.proof
    bad = dataclasses.replace(
        pf, wire_comms=[pf.wire_comms[1], pf.wire_comms[0]] + list(pf.wire_comms[2:])
    )
    bad_note = dataclasses.replace(note, proof=bad)
    with pytest.raises(FailedSnarkError):
        bad_note.verify(vk, b.tree.root)


def test_real_mint_tampered_public_amount(real_mint):
    """Raising the public mint amount must break the SNARK binding."""
    note, vk, b, _, _ = real_mint
    bad_note = dataclasses.replace(note, mint_amount=note.mint_amount + 1)
    with pytest.raises((FailedSnarkError, FailedAssetCodeVerificationError,
                        InvalidParameterError)):
        bad_note.verify(vk, b.tree.root)


def test_real_mixed_batch_verify_from_artifact():
    """Real mixed-type txn_batch_verify in the DEFAULT suite (VERDICT r3
    item 4): one multi-pairing over REAL transfer/mint/freeze proofs.

    The proofs come from data/real_notes_bn254.pkl, produced by the
    slow-CPU tier (tests/test_real_notes_slow.py, CAP_RUN_SLOW_CPU=1 via
    scripts/run_tests_full.sh) — proving the three notes takes ~8 min on
    CPU, verification is seconds.  Skips loudly when the artifact is
    missing or was built from different circuit sources.
    """
    import pickle

    from cap_tpu.lib import txn_batch_verify
    from cap_tpu.errors import FailedSnarkError
    from cap_tpu.parameters import _circuit_fingerprint
    from cap_tpu.utils.note_serde import transaction_note_from_bytes

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "data", "real_notes_bn254.pkl")
    if not os.path.exists(path):
        pytest.skip("real-notes artifact absent — run scripts/run_tests_full.sh once")
    with open(path, "rb") as f:
        blob = pickle.load(f)
    if blob["fingerprint"] != _circuit_fingerprint():
        pytest.skip(
            "real-notes artifact is stale (circuit sources changed) — "
            "regenerate via CAP_RUN_SLOW_CPU=1 pytest tests/test_real_notes_slow.py"
        )
    notes = [transaction_note_from_bytes(b) for b in blob["notes"]]
    vks = pickle.loads(blob["vks"])
    assert len(notes) == 3 and len({n.note_type for n in notes}) == 3
    txn_batch_verify(notes, blob["roots"], blob["timestamp"], vks)
    # poisoned batch must fail: swap two roots
    bad_roots = [blob["roots"][1], blob["roots"][0], blob["roots"][2]]
    with pytest.raises(Exception):
        txn_batch_verify(notes, bad_roots, blob["timestamp"], vks)
