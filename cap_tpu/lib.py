"""Top-level transaction API (reference src/lib.rs twin, SURVEY.md §2.1
"Crate root / TransactionNote"): the TransactionNote sum type, batch
verification, fee derivation/collection, receiver-memo signing."""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

from cap_tpu.errors import (
    FailedReceiverMemoSignatureError,
    FailedTransactionVerificationError,
    IncorrectFeeError,
    InvalidParameterError,
)
from cap_tpu.freeze import FreezeNote
from cap_tpu.mint import MintNote
from cap_tpu.structs import (
    RecordOpening,
    get_receiver_memos_digest,
    safe_sum_amount,
)
from cap_tpu.transfer import TransferNote


class NoteType(Enum):
    TRANSFER = 0
    MINT = 1
    FREEZE = 2


@dataclass(frozen=True)
class TransactionNote:
    """Sum type over the three note kinds (reference lib.rs:206-213); the
    flag byte in serialization is the NoteType value (lib.rs:215-267)."""

    note: object  # TransferNote | MintNote | FreezeNote

    @staticmethod
    def transfer(note: TransferNote) -> "TransactionNote":
        return TransactionNote(note)

    @staticmethod
    def mint(note: MintNote) -> "TransactionNote":
        return TransactionNote(note)

    @staticmethod
    def freeze(note: FreezeNote) -> "TransactionNote":
        return TransactionNote(note)

    @property
    def note_type(self) -> NoteType:
        if isinstance(self.note, TransferNote):
            return NoteType.TRANSFER
        if isinstance(self.note, MintNote):
            return NoteType.MINT
        if isinstance(self.note, FreezeNote):
            return NoteType.FREEZE
        raise InvalidParameterError("unknown note type")

    # -- accessors (lib.rs nullifiers/output_commitments/...) ---------------
    def nullifiers(self) -> list:
        return self.note.nullifiers()

    def output_commitments(self) -> list:
        oc = self.note.output_commitments
        return oc() if callable(oc) else list(oc)

    def output_len(self) -> int:
        return len(self.output_commitments())

    def merkle_root(self) -> int:
        return self.note.merkle_root()

    def validity_proof(self):
        return self.note.proof

    def txn_memo_ver_key(self):
        return self.note.aux_info.txn_memo_ver_key

    def fee(self) -> int:
        return self.note.aux_info.fee

    # -- verification --------------------------------------------------------
    def verify(self, verifying_key, merkle_root: int, timestamp: int) -> None:
        if isinstance(self.note, TransferNote):
            self.note.verify(verifying_key, merkle_root, timestamp)
        elif isinstance(self.note, MintNote):
            self.note.verify(verifying_key, merkle_root)
        else:
            self.note.verify(verifying_key, merkle_root)


def txn_batch_verify(notes, merkle_roots, timestamp, verifying_keys) -> None:
    """Batch-verify heterogeneous notes with ONE multi-pairing
    (reference lib.rs:455-529).  Structural checks (roots, timestamps,
    Keccak asset-code bindings) run per note and short-circuit first."""
    from cap_tpu.plonk.verifier import batch_verify as plonk_batch_verify
    from cap_tpu.proof import freeze as fproof, mint as mproof, transfer as tproof
    from cap_tpu.utils.serde import te_point_to_bytes

    if not (len(notes) == len(merkle_roots) == len(verifying_keys)):
        raise InvalidParameterError("batch verify argument length mismatch")
    vks, pubs, proofs, exts = [], [], [], []
    for tn, root, vk in zip(notes, merkle_roots, verifying_keys):
        note = tn.note if isinstance(tn, TransactionNote) else tn
        if isinstance(note, TransferNote):
            pub = note.check_instance_and_get_public_input(root, timestamp)
            vks.append(vk.plonk_vk)
            exts.append(
                te_point_to_bytes(note.aux_info.txn_memo_ver_key)
                + note.aux_info.extra_proof_bound_data
            )
        elif isinstance(note, MintNote):
            if note.aux_info.merkle_root != root:
                raise FailedTransactionVerificationError("merkle root mismatch")
            note.mint_asset_def.code.verify_domestic(note.mint_internal_asset_code)
            pub = note.check_instance_and_get_public_input(root)
            vks.append(vk.plonk_vk)
            exts.append(te_point_to_bytes(note.aux_info.txn_memo_ver_key))
        elif isinstance(note, FreezeNote):
            pub = note.check_instance_and_get_public_input(root)
            vks.append(vk.plonk_vk)
            exts.append(te_point_to_bytes(note.aux_info.txn_memo_ver_key))
        else:
            raise InvalidParameterError("unknown note type")
        pubs.append(pub.to_scalars())
        proofs.append(note.proof)
    if not plonk_batch_verify(vks, pubs, proofs, exts):
        raise FailedTransactionVerificationError("batch verification failed")


def derive_txns_fee_records(rng, fee_collector_pub_key, notes) -> RecordOpening:
    """Collect all fees of a block into one native record
    (reference lib.rs:540-572)."""
    from cap_tpu.structs import AssetDefinition

    total = calculate_fee(notes)
    return RecordOpening.new(rng, total, AssetDefinition.native(), fee_collector_pub_key)


def calculate_fee(notes) -> int:
    """(reference lib.rs:575-586; overflow -> IncorrectFee, lib.rs:585)"""
    try:
        return safe_sum_amount(
            (tn.fee() if isinstance(tn, TransactionNote) else tn.aux_info.fee)
            for tn in notes
        )
    except InvalidParameterError as e:
        raise IncorrectFeeError(f"overflow in total fee: {e}") from e


def sign_receiver_memos(keypair, memos):
    """Sign the digest of receiver memos with the per-txn Schnorr key
    (reference lib.rs:589-598).  keypair: the SchnorrKeyPair returned by
    note generation."""
    digest = get_receiver_memos_digest(memos)
    from cap_tpu.utils.rng import CapRng

    return keypair.sign([digest], CapRng())


def verify_receiver_memo_signature(note, memos, sig) -> None:
    """Check the memo signature against a note's bound verification key."""
    from cap_tpu.crypto import schnorr

    tn = note if isinstance(note, TransactionNote) else TransactionNote(note)
    digest = get_receiver_memos_digest(memos)
    if not schnorr.verify(tn.txn_memo_ver_key(), [digest], sig):
        raise FailedReceiverMemoSignatureError("receiver memo signature invalid")
