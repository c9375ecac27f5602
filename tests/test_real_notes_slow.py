"""Slow-CPU tier: REAL proofs for ALL THREE note types (VERDICT r3 items 4+7).

Gated behind CAP_RUN_SLOW_CPU=1 (run by scripts/run_tests_full.sh); the
default suite keeps the ~2-min real mint (test_real_note.py).  This tier
uses the native-C++ host Pippenger (CAP_MSM=host) end to end:

  * a real VIEWED + CREDENTIALED 2-in/2-out transfer (domain 2^15) —
    prove, verify with real pairings, then validate the viewer-decryption
    and credential flows against that real proof (reference
    tests/examples.rs:1855-2106 runs its viewed scenarios on real SNARKs);
  * a real 2-input freeze (reference tests/examples.rs:2106-2258);
  * persistence: the three real notes (incl. the default-suite mint) and
    their verifying keys are written to data/real_notes_bn254.pkl so the
    DEFAULT suite can run a real mixed-type `txn_batch_verify` (one
    multi-pairing over real proofs — reference src/lib.rs:732-819,
    benches/batch_verification.rs:40-51) without re-proving.

Wall-clock: ~6-10 min total on this image's CPU.
"""

import os
import pickle

import pytest

from cap_tpu.utils.rng import test_rng

if os.environ.get("CAP_RUN_SLOW_CPU") != "1":
    pytest.skip(
        "slow-CPU real-proof tier (set CAP_RUN_SLOW_CPU=1; scripts/run_tests_full.sh does)",
        allow_module_level=True,
    )

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ARTIFACT = os.path.join(REPO, "data", "real_notes_bn254.pkl")
DEPTH = 6
VALID_UNTIL = 10


@pytest.fixture(scope="module", autouse=True)
def host_msm():
    old = os.environ.get("CAP_MSM")
    os.environ["CAP_MSM"] = "host"
    yield
    if old is None:
        os.environ.pop("CAP_MSM", None)
    else:
        os.environ["CAP_MSM"] = old


@pytest.fixture(scope="module")
def srs():
    from cap_tpu.proof import universal_setup_for_staging

    return universal_setup_for_staging(2**15 + 2, os.path.join(REPO, "data"))


def test_real_viewed_credentialed_transfer_and_freeze_and_artifact(srs):
    """One real prove+verify per remaining note type, viewer + credential
    flows validated against the real transfer, then the mixed artifact."""
    from cap_tpu.errors import FailedViewableMemoDecryptionError
    from cap_tpu.keys import ViewerKeyPair
    from cap_tpu.lib import TransactionNote, txn_batch_verify
    from cap_tpu.proof import freeze as fproof, mint as mproof, transfer as tproof
    from cap_tpu.utils.note_serde import transaction_note_to_bytes
    from cap_tpu.utils.params_builder import (
        FreezeParamsBuilder,
        MintParamsBuilder,
        TransferParamsBuilder,
    )

    rng = test_rng()

    # --- real viewed + credentialed transfer (domain 2^15) ---------------
    tpk, tvk = tproof.preprocess(srs, 2, 2, DEPTH)
    tb = TransferParamsBuilder(
        rng, 2, 2, DEPTH, non_native=True, with_viewer=True,
        with_credential=True, valid_until=VALID_UNTIL,
    )
    tnote, _, outputs = tb.build_transfer_note(tpk)
    tnote.verify(tvk, tb.tree.root, VALID_UNTIL)  # real pairings

    # viewer decryption against the REAL note (reference keys.rs:379-434)
    vins, vouts = tb.viewer.open_transfer_viewing_memo(tb.asset_def, tnote)
    assert len(vins) == 1 and len(vouts) == 1
    assert vins[0].amount == tb.input_amounts[0]
    assert vins[0].user_address == tb.users[1].address()
    # credentialed policy: revealed attributes round-trip
    assert any(a is not None for a in vins[0].attributes)
    # a different viewer key cannot decrypt the real memo
    other = ViewerKeyPair.generate(rng)
    from cap_tpu.errors import InvalidParameterError

    with pytest.raises((FailedViewableMemoDecryptionError, InvalidParameterError)):
        other.open_transfer_viewing_memo(tb.asset_def, tnote)

    # --- real 2-input freeze ---------------------------------------------
    fpk, fvk = fproof.preprocess(srs, 2, DEPTH)
    fb = FreezeParamsBuilder(rng, 2, DEPTH)
    fnote, *_ = fb.build_freeze_note(fpk)
    fnote.verify(fvk, fb.tree.root)  # real pairings

    # --- real mint (same shape as the default-suite anchor) ---------------
    mpk, mvk = mproof.preprocess(srs, DEPTH)
    mb = MintParamsBuilder(rng, DEPTH, with_viewer=True)
    mnote, *_ = mb.build_mint_note(mpk)
    mnote.verify(mvk, mb.tree.root)

    # --- real mixed-type batch verify + artifact for the default suite ----
    notes = [
        TransactionNote.transfer(tnote),
        TransactionNote.mint(mnote),
        TransactionNote.freeze(fnote),
    ]
    roots = [tb.tree.root, mb.tree.root, fb.tree.root]
    vks = [tvk, mvk, fvk]
    txn_batch_verify(notes, roots, VALID_UNTIL, vks)  # one real multi-pairing

    from cap_tpu.parameters import _circuit_fingerprint

    blob = {
        "fingerprint": _circuit_fingerprint(),
        "timestamp": VALID_UNTIL,
        "roots": roots,
        "notes": [transaction_note_to_bytes(n) for n in notes],
        "vks": pickle.dumps(vks),
    }
    tmp = ARTIFACT + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(blob, f)
    os.replace(tmp, ARTIFACT)


def test_multihost_pool_proves_real_mint_notes(srs):
    """Multi-host DP pool over REAL CAP mint notes (VERDICT r3 item 5):
    2 shared-nothing worker processes, each preprocessing mint once
    (domain 2^14) and proving one real mint note from its queue shard
    (reference batch shape: benches/batch_verification.rs:40-51).
    scripts/bench_multihost.py measures proofs/s at 2 and 4 hosts for
    BASELINE.md."""
    from cap_tpu.parallel.hosts import aggregate_proofs_per_s, simulate_host_pool

    results = simulate_host_pool(2, 1, workload="mint", timeout=1800.0)
    assert all(r.ok for r in results)
    assert sum(r.proofs for r in results) == 2
    assert aggregate_proofs_per_s(results) > 0
