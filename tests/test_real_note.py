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
