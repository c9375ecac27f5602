"""FreezeNote — freeze/unfreeze transactions (reference src/freeze.rs twin)."""

from __future__ import annotations

from dataclasses import dataclass

from cap_tpu.crypto.schnorr import SchnorrKeyPair
from cap_tpu.errors import (
    FailedSnarkError,
    FailedTransactionVerificationError,
    InvalidParameterError,
)
from cap_tpu.proof import freeze as freeze_proof
from cap_tpu.structs import RecordOpening, TxnFeeInfo
from cap_tpu.utils import validation


@dataclass(frozen=True)
class FreezeNoteInput:
    """(reference freeze.rs:74-82)"""

    ro: RecordOpening
    acc_member_witness: object
    keypair: object                 # keys.FreezerKeyPair


@dataclass(frozen=True)
class FreezeAuxInfo:
    merkle_root: int
    fee: int
    txn_memo_ver_key: object


@dataclass(frozen=True)
class FreezeNote:
    """(reference freeze.rs:41-50)"""

    input_nullifiers: list
    output_commitments: list
    proof: object
    aux_info: FreezeAuxInfo

    @staticmethod
    def generate(rng, inputs, txn_fee_info: TxnFeeInfo, proving_key):
        """Outputs are auto-derived flipped-flag clones with fresh blinds
        (reference freeze.rs:97-156).  Returns (note, sig_keypair, output_ros)."""
        n_in = len(inputs) + 1
        if n_in != proving_key.n_inputs:
            raise InvalidParameterError("proving key shape mismatch")
        depth = proving_key.tree_depth
        validation.check_fee(txn_fee_info.fee_input)
        for inp in inputs:
            if len(inp.acc_member_witness.merkle_path.nodes) != depth:
                raise InvalidParameterError("merkle path depth mismatch")
            pol = inp.ro.asset_def.policy
            if not inp.ro.is_dummy():
                if not pol.is_freezer_set():
                    raise InvalidParameterError("record has no freezer policy")
                if pol.freezer_pk != inp.keypair.pk:
                    raise InvalidParameterError("freezer keypair mismatch")
        roots = {txn_fee_info.fee_input.acc_member_witness.root} | {
            i.acc_member_witness.root for i in inputs if not i.ro.is_dummy()
        }
        if len(roots) != 1:
            raise InvalidParameterError("inconsistent merkle roots")

        output_ros = freeze_proof.get_output_ros(rng, [i.ro for i in inputs])
        witness = freeze_proof.FreezeWitness(
            input_ros=[txn_fee_info.fee_input.ro] + [i.ro for i in inputs],
            acc_member_witnesses=[txn_fee_info.fee_input.acc_member_witness]
            + [i.acc_member_witness for i in inputs],
            output_ros=[txn_fee_info.fee_chg_ro] + output_ros,
            fee_sk=txn_fee_info.fee_input.owner_keypair.addr_keypair.sk,
            freezing_sks=[i.keypair.sk for i in inputs],
        )
        pub_input = freeze_proof.FreezePublicInput.from_witness(
            witness, fee=txn_fee_info.fee_amount
        )
        validation.check_distinct_input_nullifiers(pub_input.input_nullifiers)
        memo_kp = SchnorrKeyPair.generate(rng)
        proof = freeze_proof.prove(rng, proving_key, witness, pub_input, memo_kp.vk)
        note = FreezeNote(
            input_nullifiers=pub_input.input_nullifiers,
            output_commitments=pub_input.output_commitments,
            proof=proof,
            aux_info=FreezeAuxInfo(
                merkle_root=pub_input.merkle_root,
                fee=txn_fee_info.fee_amount,
                txn_memo_ver_key=memo_kp.vk,
            ),
        )
        return note, memo_kp, output_ros

    def check_instance_and_get_public_input(self, merkle_root):
        if self.aux_info.merkle_root != merkle_root:
            raise FailedTransactionVerificationError("merkle root mismatch")
        return freeze_proof.FreezePublicInput(
            merkle_root=merkle_root,
            native_asset_code=1,
            fee=self.aux_info.fee,
            input_nullifiers=self.input_nullifiers,
            output_commitments=self.output_commitments,
        )

    def verify(self, verifying_key, merkle_root) -> None:
        """(reference freeze.rs:163-175)"""
        pub = self.check_instance_and_get_public_input(merkle_root)
        if not freeze_proof.verify(
            verifying_key, pub, self.proof, self.aux_info.txn_memo_ver_key
        ):
            raise FailedSnarkError("freeze proof verification failed")

    def nullifiers(self) -> list:
        return list(self.input_nullifiers)

    def merkle_root(self) -> int:
        return self.aux_info.merkle_root
