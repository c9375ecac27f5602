"""Single-process mock ledger for multi-party integration testing.

Twin of the reference's `tests/examples.rs` mock objects (SURVEY.md §4.5):
LedgerStateMock (3-ary Merkle tree + nullifier set + historical roots),
ValidatorMock (vk cache, structural + SNARK checks, block building and fee
collection), SimpleUserWalletMock (memo scanning, spending), ViewerMock,
FreezerMock, AssetIssuerMock.  This is the "how to test multi-party without
a network" answer, reused by the integration tests and benchmarks.
"""

from __future__ import annotations

from dataclasses import dataclass

from cap_tpu.crypto.merkle import AccMemberWitness, MerkleTree
from cap_tpu.errors import FailedTransactionVerificationError, TxnApiError
from cap_tpu.keys import UserKeyPair, ViewerKeyPair, FreezerKeyPair
from cap_tpu.lib import TransactionNote, calculate_fee, txn_batch_verify
from cap_tpu.structs import (
    AssetCode,
    AssetCodeSeed,
    AssetDefinition,
    ReceiverMemo,
    RecordCommitment,
    RecordOpening,
)


class LedgerStateMock:
    """(examples.rs:49-212)"""

    def __init__(self, depth: int):
        self.tree = MerkleTree(depth)
        self.nullifiers: set = set()
        self.historical_roots: set = {self.tree.root}

    def insert_record(self, comm: RecordCommitment) -> int:
        uid = self.tree.push(comm.value)
        self.historical_roots.add(self.tree.root)
        return uid

    def insert_block(self, block) -> list:
        """Apply a verified block; returns uids of all new records."""
        uids = []
        for note in block.notes:
            for n in note.nullifiers():
                self.nullifiers.add(n.value)
            for cm in note.output_commitments():
                uids.append(self.insert_record(cm))
        if block.fee_record is not None:
            uids.append(self.insert_record(RecordCommitment.from_ro(block.fee_record)))
            self.historical_roots.add(self.tree.root)
        return uids

    def check_nullifier_unspent(self, nullifier) -> bool:
        return nullifier.value not in self.nullifiers

    def check_root_historical(self, root: int) -> bool:
        return root in self.historical_roots


@dataclass
class MockBlock:
    """(examples.rs:1528+)"""

    notes: list                      # TransactionNote
    fee_record: RecordOpening | None = None


class ValidatorMock:
    """(examples.rs:238+): verifying-key cache + full block validation."""

    def __init__(self, ledger: LedgerStateMock, timestamp: int = 0):
        self.ledger = ledger
        self.timestamp = timestamp
        self.vk_cache: dict = {}  # (type, n_in, n_out) -> verifying key

    def register_vk(self, note_type: str, n_in: int, n_out: int, vk) -> None:
        self.vk_cache[(note_type, n_in, n_out)] = vk

    def _vk_for(self, tn: TransactionNote):
        from cap_tpu.freeze import FreezeNote
        from cap_tpu.mint import MintNote

        note = tn.note
        if isinstance(note, MintNote):
            key = ("mint", 1, 2)
        elif isinstance(note, FreezeNote):
            key = ("freeze", len(note.input_nullifiers), len(note.output_commitments))
        else:
            key = ("transfer", len(note.inputs_nullifiers), len(note.output_commitments))
        if key not in self.vk_cache:
            raise FailedTransactionVerificationError(f"no verifying key for {key}")
        return self.vk_cache[key]

    def validate_txn_structure(self, tn: TransactionNote) -> None:
        if not self.ledger.check_root_historical(tn.merkle_root()):
            raise FailedTransactionVerificationError("unknown merkle root")
        for n in tn.nullifiers():
            if not self.ledger.check_nullifier_unspent(n):
                raise FailedTransactionVerificationError("double spend")

    def validate_single(self, tn: TransactionNote) -> None:
        self.validate_txn_structure(tn)
        tn.verify(self._vk_for(tn), tn.merkle_root(), self.timestamp)

    def validate_and_apply_block(self, rng, notes, fee_collector_pub_key) -> MockBlock:
        """Batch-verify all notes, collect fees, apply (examples.rs block flow)."""
        seen = set()
        for tn in notes:
            self.validate_txn_structure(tn)
            for n in tn.nullifiers():
                if n.value in seen:
                    raise FailedTransactionVerificationError("intra-block double spend")
                seen.add(n.value)
        txn_batch_verify(
            notes,
            [tn.merkle_root() for tn in notes],
            self.timestamp,
            [self._vk_for(tn) for tn in notes],
        )
        from cap_tpu.lib import derive_txns_fee_records

        fee_record = (
            derive_txns_fee_records(rng, fee_collector_pub_key, notes)
            if calculate_fee(notes) > 0
            else None
        )
        block = MockBlock(list(notes), fee_record)
        self.ledger.insert_block(block)
        return block


@dataclass
class OwnedRecord:
    ro: RecordOpening
    uid: int
    spent: bool = False


class SimpleUserWalletMock:
    """(examples.rs:498+): scans receiver memos, tracks balances, spends."""

    def __init__(self, rng, keypair: UserKeyPair):
        self.rng = rng
        self.keypair = keypair
        self.records: list[OwnedRecord] = []

    def scan_memo(self, memo: ReceiverMemo, comm: RecordCommitment, uid: int) -> bool:
        try:
            ro = memo.decrypt(self.keypair, comm)
        except TxnApiError:
            return False
        except Exception:
            return False
        self.records.append(OwnedRecord(ro, uid))
        return True

    def balance(self, asset_code: AssetCode) -> int:
        return sum(
            r.ro.amount
            for r in self.records
            if not r.spent and r.ro.asset_def.code == asset_code and r.ro.freeze_flag == 0
        )

    def spendable_records(self, asset_code: AssetCode, amount: int) -> list:
        picked, total = [], 0
        for r in self.records:
            if r.spent or r.ro.asset_def.code != asset_code or r.ro.freeze_flag != 0:
                continue
            picked.append(r)
            total += r.ro.amount
            if total >= amount:
                return picked
        raise TxnApiError("insufficient balance")

    def mark_spent(self, recs) -> None:
        for r in recs:
            r.spent = True


class ViewerMock:
    """(examples.rs): tracks decrypted viewing data per asset."""

    def __init__(self, keypair: ViewerKeyPair, asset_def: AssetDefinition):
        self.keypair = keypair
        self.asset_def = asset_def

    def scan_transfer(self, note):
        return self.keypair.open_transfer_viewing_memo(self.asset_def, note)

    def scan_mint(self, note):
        return self.keypair.open_mint_viewing_memo(note)


class FreezerMock:
    """(examples.rs): uses viewing data to build freeze inputs."""

    def __init__(self, keypair: FreezerKeyPair):
        self.keypair = keypair

    def freeze_input_from_viewing_data(self, ledger: LedgerStateMock, vd, uid: int,
                                       asset_def: AssetDefinition):
        from cap_tpu.freeze import FreezeNoteInput
        from cap_tpu.keys import UserPubKey
        from cap_tpu.crypto.aead import AeadEncKey
        from cap_tpu.structs import BlindFactor

        ro = RecordOpening(
            amount=vd.amount,
            asset_def=asset_def,
            pub_key=UserPubKey(vd.user_address, AeadEncKey(b"\x00" * 32)),
            freeze_flag=0,
            blind=BlindFactor(vd.blinding_factor),
        )
        return FreezeNoteInput(
            ro=ro,
            acc_member_witness=AccMemberWitness.lookup_from_tree(ledger.tree, uid),
            keypair=self.keypair,
        )


class AssetIssuerMock:
    """(examples.rs:989+): holds the asset seed/description, mints."""

    def __init__(self, rng, description: bytes, policy):
        self.seed = AssetCodeSeed.generate(rng)
        self.description = description
        code, _ = AssetCode.new_domestic(self.seed, description)
        self.asset_def = AssetDefinition.new(code, policy)
