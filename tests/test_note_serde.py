"""Wire-format roundtrips for TransactionNote (structurally valid, not
cryptographically valid — proving-level roundtrips live in the slow e2e)."""

from cap_tpu.crypto import jubjub
from cap_tpu.crypto.bn254 import G1_GEN, g1_mul
from cap_tpu.crypto.elgamal import ElGamalCiphertext
from cap_tpu.fields.host import FR
from cap_tpu.freeze import FreezeAuxInfo, FreezeNote
from cap_tpu.lib import TransactionNote, NoteType
from cap_tpu.mint import MintAuxInfo, MintNote
from cap_tpu.plonk.structs import PlonkProof
from cap_tpu.structs import (
    AssetCode,
    AssetDefinition,
    AssetPolicy,
    InternalAssetCode,
    Nullifier,
    RecordCommitment,
    ViewableMemo,
)
from cap_tpu.transfer import AuxInfo, TransferNote
from cap_tpu.utils.note_serde import (
    transaction_note_from_bytes,
    transaction_note_to_bytes,
)
from cap_tpu.utils.rng import test_rng


def _fake_proof(rng):
    pts = [g1_mul(G1_GEN, FR.rand(rng)) for _ in range(13)]
    return PlonkProof(
        wire_comms=pts[0:5], z_comm=pts[5], t_comms=pts[6:11],
        wire_evals=[FR.rand(rng) for _ in range(5)],
        sigma_evals=[FR.rand(rng) for _ in range(4)],
        z_omega_eval=FR.rand(rng),
        w_zeta=pts[11], w_zeta_omega=pts[12],
    )


def _fake_memo(rng, n):
    return ViewableMemo(
        ElGamalCiphertext(jubjub.rand_point(rng), tuple(FR.rand(rng) for _ in range(n)))
    )


def test_plonk_proof_roundtrip():
    rng = test_rng()
    p = _fake_proof(rng)
    assert PlonkProof.from_bytes(p.to_bytes()) == p


def test_transfer_note_roundtrip():
    rng = test_rng()
    note = TransferNote(
        inputs_nullifiers=[Nullifier(FR.rand(rng)) for _ in range(2)],
        output_commitments=[RecordCommitment(FR.rand(rng)) for _ in range(3)],
        proof=_fake_proof(rng),
        viewing_memo=_fake_memo(rng, 21),
        aux_info=AuxInfo(
            merkle_root=FR.rand(rng), fee=7, valid_until=99,
            txn_memo_ver_key=jubjub.rand_point(rng),
            extra_proof_bound_data=b"bound-data",
        ),
    )
    tn = TransactionNote.transfer(note)
    back = transaction_note_from_bytes(transaction_note_to_bytes(tn))
    assert back.note_type == NoteType.TRANSFER
    assert back.note == note


def test_mint_note_roundtrip():
    rng = test_rng()
    code, _ = AssetCode.random(rng)
    note = MintNote(
        input_nullifier=Nullifier(FR.rand(rng)),
        chg_comm=RecordCommitment(FR.rand(rng)),
        mint_comm=RecordCommitment(FR.rand(rng)),
        mint_amount=12345,
        mint_asset_def=AssetDefinition(code, AssetPolicy.rand_for_test(rng)),
        mint_internal_asset_code=InternalAssetCode(FR.rand(rng)),
        proof=_fake_proof(rng),
        viewing_memo=_fake_memo(rng, 3),
        aux_info=MintAuxInfo(
            merkle_root=FR.rand(rng), fee=3,
            txn_memo_ver_key=jubjub.rand_point(rng),
        ),
    )
    back = transaction_note_from_bytes(transaction_note_to_bytes(note))
    assert back.note_type == NoteType.MINT
    assert back.note == note


def test_freeze_note_roundtrip():
    rng = test_rng()
    note = FreezeNote(
        input_nullifiers=[Nullifier(FR.rand(rng)) for _ in range(3)],
        output_commitments=[RecordCommitment(FR.rand(rng)) for _ in range(3)],
        proof=_fake_proof(rng),
        aux_info=FreezeAuxInfo(
            merkle_root=FR.rand(rng), fee=1,
            txn_memo_ver_key=jubjub.rand_point(rng),
        ),
    )
    back = transaction_note_from_bytes(transaction_note_to_bytes(note))
    assert back.note_type == NoteType.FREEZE
    assert back.note == note


def test_tagged_blob():
    from cap_tpu.utils.serde import tagged_blob, untag_blob

    s = tagged_blob("USERPUBKEY", b"\x01\x02\x03")
    assert s.startswith("USERPUBKEY~")
    assert untag_blob("USERPUBKEY", s) == b"\x01\x02\x03"
    import pytest

    with pytest.raises(ValueError):
        untag_blob("OTHER", s)
