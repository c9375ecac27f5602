"""MintNote — asset issuance transactions (reference src/mint.rs twin).

1 fee input, 2 outputs (fee change + minted record).  `generate` runs the
host validation pipeline, assembles witness + public input, and proves; the
verifier additionally runs the host Keccak binding `verify_domestic` between
the public internal code and the public asset code (reference
src/mint.rs:155-170, SURVEY.md §3.4).
"""

from __future__ import annotations

from dataclasses import dataclass

from cap_tpu.crypto import jubjub
from cap_tpu.crypto.schnorr import SchnorrKeyPair
from cap_tpu.errors import InvalidParameterError
from cap_tpu.proof import mint as mint_proof
from cap_tpu.structs import (
    AssetCodeSeed,
    AssetDefinition,
    InternalAssetCode,
    RecordOpening,
    TxnFeeInfo,
    ViewableMemo,
    asset_code_digest,
    check_amount,
)
from cap_tpu.utils import validation


@dataclass(frozen=True)
class MintAuxInfo:
    merkle_root: int
    fee: int
    txn_memo_ver_key: object  # jubjub point (Schnorr verification key)


@dataclass(frozen=True)
class MintNote:
    """(reference mint.rs:41-60)"""

    input_nullifier: object
    chg_comm: object
    mint_comm: object
    mint_amount: int
    mint_asset_def: AssetDefinition
    mint_internal_asset_code: InternalAssetCode
    proof: object
    viewing_memo: ViewableMemo
    aux_info: MintAuxInfo

    @staticmethod
    def generate(
        rng,
        mint_ro: RecordOpening,
        ac_seed: AssetCodeSeed,
        ac_description: bytes,
        txn_fee_info: TxnFeeInfo,
        proving_key: mint_proof.MintProvingKey,
    ) -> tuple:
        """Returns (MintNote, SchnorrKeyPair for receiver-memo signing,
        fee change RecordOpening is txn_fee_info's change — reference
        mint.rs:90-152 returns (note, sig_keypair))."""
        fee_input = txn_fee_info.fee_input
        chg_ro = txn_fee_info.fee_chg_ro

        # host validation pipeline (mint.rs:106-111)
        validation.check_fee(fee_input)
        check_amount(mint_ro.amount)
        if mint_ro.amount == 0:
            raise InvalidParameterError("cannot mint zero amount")
        internal = InternalAssetCode.new(ac_seed, ac_description)
        mint_ro.asset_def.code.verify_domestic(internal)
        if mint_ro.freeze_flag != 0:
            raise InvalidParameterError("minted record must be unfrozen")
        depth = len(fee_input.acc_member_witness.merkle_path.nodes)
        if depth != proving_key.tree_depth:
            raise InvalidParameterError("proving key tree depth mismatch")

        witness = mint_proof.MintWitness(
            fee_ro=fee_input.ro,
            acc_member_witness=fee_input.acc_member_witness,
            fee_sk=fee_input.owner_keypair.addr_keypair.sk,
            mint_ro=mint_ro,
            chg_ro=chg_ro,
            ac_seed=ac_seed.value,
            ac_digest=asset_code_digest(ac_description),
            viewing_memo_enc_rand=jubjub.rand_scalar(rng),
        )
        pub_input = mint_proof.MintPublicInput.from_witness(
            witness, fee=txn_fee_info.fee_amount
        )
        memo_kp = SchnorrKeyPair.generate(rng)
        proof = mint_proof.prove(rng, proving_key, witness, pub_input, memo_kp.vk)
        note = MintNote(
            input_nullifier=pub_input.input_nullifier,
            chg_comm=pub_input.chg_rc,
            mint_comm=pub_input.mint_rc,
            mint_amount=mint_ro.amount,
            mint_asset_def=mint_ro.asset_def,
            mint_internal_asset_code=internal,
            proof=proof,
            viewing_memo=pub_input.viewing_memo,
            aux_info=MintAuxInfo(
                merkle_root=pub_input.merkle_root,
                fee=txn_fee_info.fee_amount,
                txn_memo_ver_key=memo_kp.vk,
            ),
        )
        return note, memo_kp

    def verify(self, verifying_key: mint_proof.MintVerifyingKey, merkle_root: int) -> None:
        """(reference mint.rs:155-170)"""
        if self.aux_info.merkle_root != merkle_root:
            raise InvalidParameterError("merkle root mismatch")
        # host Keccak binding: public internal code -> public asset code
        self.mint_asset_def.code.verify_domestic(self.mint_internal_asset_code)
        pub = self.check_instance_and_get_public_input(merkle_root)
        if not mint_proof.verify(
            verifying_key, pub, self.proof, self.aux_info.txn_memo_ver_key
        ):
            from cap_tpu.errors import FailedSnarkError

            raise FailedSnarkError("mint proof verification failed")

    def check_instance_and_get_public_input(self, merkle_root: int):
        return mint_proof.MintPublicInput(
            merkle_root=merkle_root,
            native_asset_code=1,
            input_nullifier=self.input_nullifier,
            fee=self.aux_info.fee,
            mint_rc=self.mint_comm,
            chg_rc=self.chg_comm,
            mint_amount=self.mint_amount,
            mint_ac=self.mint_asset_def.code,
            mint_internal_ac=self.mint_internal_asset_code,
            mint_policy=self.mint_asset_def.policy,
            viewing_memo=self.viewing_memo,
        )

    def nullifiers(self) -> list:
        return [self.input_nullifier]

    def output_commitments(self) -> list:
        return [self.chg_comm, self.mint_comm]

    def merkle_root(self) -> int:
        return self.aux_info.merkle_root
