"""TransferNote — anonymous transfer transactions (reference src/transfer.rs
twin; SURVEY.md §2.1 "Transfer note API", §3.1 call stack)."""

from __future__ import annotations

from dataclasses import dataclass

from cap_tpu.crypto import jubjub
from cap_tpu.crypto.schnorr import SchnorrKeyPair
from cap_tpu.errors import (
    FailedSnarkError,
    FailedTransactionVerificationError,
    InvalidParameterError,
)
from cap_tpu.proof import transfer as transfer_proof
from cap_tpu.structs import (
    AssetDefinition,
    ExpirableCredential,
    RecordOpening,
    TxnFeeInfo,
    ViewableMemo,
    safe_sum_amount,
)
from cap_tpu.utils import validation


@dataclass(frozen=True)
class TransferNoteInput:
    """(reference transfer.rs:97-108)"""

    ro: RecordOpening
    acc_member_witness: object
    owner_keypair: object            # keys.UserKeyPair
    cred: ExpirableCredential | None = None


@dataclass(frozen=True)
class AuxInfo:
    """(reference transfer.rs:78-91)"""

    merkle_root: int
    fee: int
    valid_until: int
    txn_memo_ver_key: object
    extra_proof_bound_data: bytes = b""


@dataclass(frozen=True)
class PreparedTransfer:
    """Everything `TransferNote.prepare` produced on the host: feed
    `witness_values`/`pub_scalars`/`ext_msg` to the device plonk prover,
    then assemble with `TransferNote.from_prepared`."""

    pub_input: object
    memo_keypair: object
    witness_values: object
    pub_scalars: list
    ext_msg: bytes
    fee: int
    valid_until: int
    extra_proof_bound_data: bytes


@dataclass(frozen=True)
class TransferNote:
    """(reference transfer.rs:54-66)"""

    inputs_nullifiers: list
    output_commitments: list
    proof: object
    viewing_memo: ViewableMemo
    aux_info: AuxInfo

    # -- generation ----------------------------------------------------------
    @staticmethod
    def generate_native(rng, inputs, output_ros, fee, valid_until, proving_key):
        """Native transfer with automatic fee change as output[0]
        (reference transfer.rs:147-224).  Returns (note, sig_keypair,
        fee_change_ro)."""
        for inp in inputs:
            if not (inp.ro.asset_def.is_native() or inp.ro.is_dummy()):
                raise InvalidParameterError("generate_native requires native inputs")
        for ro in output_ros:
            if not ro.asset_def.is_native():
                raise InvalidParameterError("generate_native requires native outputs")
        total_in = safe_sum_amount(i.ro.amount for i in inputs)
        total_out = safe_sum_amount(ro.amount for ro in output_ros)
        if total_in < total_out + fee:
            raise InvalidParameterError("insufficient input balance")
        chg_ro = RecordOpening.new(
            rng, total_in - total_out - fee, AssetDefinition.native(),
            inputs[0].ro.pub_key,
        )
        note, kp = TransferNote._generate(
            rng, list(inputs), [chg_ro] + list(output_ros),
            AssetDefinition.native(), fee, valid_until, proving_key, b"",
        )
        return note, kp, chg_ro

    @staticmethod
    def generate_non_native(rng, inputs, output_ros, txn_fee_info: TxnFeeInfo,
                            valid_until, proving_key,
                            extra_proof_bound_data: bytes = b""):
        """Non-native transfer with an explicit native fee
        (reference transfer.rs:244-269).  Returns (note, sig_keypair)."""
        asset_def = _get_transfer_asset_def(inputs, output_ros)
        if asset_def.is_native():
            raise InvalidParameterError("use generate_native for native transfers")
        fee_input = TransferNoteInput(
            ro=txn_fee_info.fee_input.ro,
            acc_member_witness=txn_fee_info.fee_input.acc_member_witness,
            owner_keypair=txn_fee_info.fee_input.owner_keypair,
        )
        return TransferNote._generate(
            rng, [fee_input] + list(inputs),
            [txn_fee_info.fee_chg_ro] + list(output_ros),
            asset_def, txn_fee_info.fee_amount, valid_until, proving_key,
            extra_proof_bound_data,
        )

    @staticmethod
    def prepare_non_native(rng, inputs, output_ros, txn_fee_info: TxnFeeInfo,
                           valid_until, proving_key,
                           extra_proof_bound_data: bytes = b""):
        """Host stage of `generate_non_native`: returns a PreparedTransfer
        for a later device prove (see parallel/queue.py)."""
        asset_def = _get_transfer_asset_def(inputs, output_ros)
        if asset_def.is_native():
            raise InvalidParameterError("use generate_native for native transfers")
        fee_input = TransferNoteInput(
            ro=txn_fee_info.fee_input.ro,
            acc_member_witness=txn_fee_info.fee_input.acc_member_witness,
            owner_keypair=txn_fee_info.fee_input.owner_keypair,
        )
        return TransferNote.prepare(
            rng, [fee_input] + list(inputs),
            [txn_fee_info.fee_chg_ro] + list(output_ros),
            asset_def, txn_fee_info.fee_amount, valid_until, proving_key,
            extra_proof_bound_data,
        )

    @staticmethod
    def _generate(rng, inputs, all_outputs, asset_def, fee, valid_until,
                  proving_key, extra_proof_bound_data):
        """(reference transfer.rs:283-338)"""
        from cap_tpu.plonk import prover as plonk_prover

        prep = TransferNote.prepare(
            rng, inputs, all_outputs, asset_def, fee, valid_until,
            proving_key, extra_proof_bound_data,
        )
        proof = plonk_prover.prove(
            rng, proving_key.plonk_pk, prep.witness_values, prep.pub_scalars,
            ext_msg=prep.ext_msg,
        )
        return TransferNote.from_prepared(prep, proof)

    @staticmethod
    def prepare(rng, inputs, all_outputs, asset_def, fee, valid_until,
                proving_key, extra_proof_bound_data):
        """Host stage of note generation: the full validation pipeline,
        witness/public-input assembly, memo keypair, and tape-replayed
        witness values.  Pair with a device plonk prove and
        `from_prepared` — parallel/queue.py uses this split to overlap
        host prep with device proving across a note queue."""
        n_in, n_out = len(inputs), len(all_outputs)
        if (n_in, n_out) != (proving_key.n_inputs, proving_key.n_outputs):
            raise InvalidParameterError("proving key shape mismatch")
        depth = proving_key.tree_depth
        for inp in inputs:
            if len(inp.acc_member_witness.merkle_path.nodes) != depth:
                raise InvalidParameterError("merkle path depth mismatch")

        # validation pipeline (utils/mod.rs, SURVEY §3.1)
        input_ros = [i.ro for i in inputs]
        validation.check_input_pub_keys(input_ros, [i.owner_keypair for i in inputs])
        validation.check_dummy_inputs(input_ros)
        validation.check_unfrozen(input_ros + list(all_outputs))
        validation.check_asset_amounts_balanced(input_ros, all_outputs)
        if not inputs[0].ro.asset_def.is_native():
            raise InvalidParameterError("first input must fund the native fee")
        _check_policy_rules(asset_def)
        # fee consistency
        native_in = sum(r.amount for r in input_ros if r.asset_def.is_native())
        native_out = sum(r.amount for r in all_outputs if r.asset_def.is_native())
        if validation.derive_fee(native_in, native_out) != fee:
            raise InvalidParameterError("fee does not match native balance difference")
        # root consistency + credentials
        validation.check_and_get_root(
            [(i.acc_member_witness, i.ro.is_dummy()) for i in inputs]
        )
        for inp in inputs:
            if inp.ro.asset_def.policy.is_cred_creator_set() and not inp.ro.is_dummy():
                if inp.cred is None:
                    raise InvalidParameterError("credential required by policy")
                inp.cred.verify(now=valid_until)
                from cap_tpu.constants import MAX_TIMESTAMP_LEN

                if inp.cred.expiry - valid_until >= (1 << MAX_TIMESTAMP_LEN):
                    raise InvalidParameterError("credential expiry too far in the future")
                if inp.cred.user_addr != inp.ro.pub_key.address:
                    raise InvalidParameterError("credential address mismatch")

        secrets = [
            transfer_proof.InputSecret(
                ro=i.ro,
                acc_member_witness=i.acc_member_witness,
                sk=i.owner_keypair.addr_keypair.sk,
                cred=transfer_proof.InputSecret.normalize_cred(i.cred),
            )
            for i in inputs
        ]
        witness = transfer_proof.TransferWitness(
            asset_def=asset_def,
            input_secrets=secrets,
            output_ros=list(all_outputs),
            viewing_memo_enc_rand=jubjub.rand_scalar(rng),
        )
        pub_input = transfer_proof.TransferPublicInput.from_witness(
            witness, fee=fee, valid_until=valid_until
        )
        validation.check_distinct_input_nullifiers(pub_input.input_nullifiers)
        memo_kp = SchnorrKeyPair.generate(rng)
        wvals, pubs, ext = transfer_proof.prepare_prove(
            proving_key, witness, pub_input, memo_kp.vk, extra_proof_bound_data
        )
        return PreparedTransfer(
            pub_input=pub_input,
            memo_keypair=memo_kp,
            witness_values=wvals,
            pub_scalars=pubs,
            ext_msg=ext,
            fee=fee,
            valid_until=valid_until,
            extra_proof_bound_data=extra_proof_bound_data,
        )

    @staticmethod
    def from_prepared(prep: "PreparedTransfer", proof):
        """Assemble the note from a prepared context and its proof."""
        pub_input = prep.pub_input
        note = TransferNote(
            inputs_nullifiers=pub_input.input_nullifiers,
            output_commitments=pub_input.output_commitments,
            proof=proof,
            viewing_memo=pub_input.viewing_memo,
            aux_info=AuxInfo(
                merkle_root=pub_input.merkle_root,
                fee=prep.fee,
                valid_until=prep.valid_until,
                txn_memo_ver_key=prep.memo_keypair.vk,
                extra_proof_bound_data=prep.extra_proof_bound_data,
            ),
        )
        return note, prep.memo_keypair

    # -- verification --------------------------------------------------------
    def check_instance_and_get_public_input(self, merkle_root, timestamp):
        """(reference transfer.rs:370-399)"""
        if self.aux_info.merkle_root != merkle_root:
            raise FailedTransactionVerificationError("merkle root mismatch")
        if timestamp > self.aux_info.valid_until:
            raise FailedTransactionVerificationError("transaction expired")
        return transfer_proof.TransferPublicInput(
            merkle_root=merkle_root,
            native_asset_code=1,
            valid_until=self.aux_info.valid_until,
            fee=self.aux_info.fee,
            input_nullifiers=self.inputs_nullifiers,
            output_commitments=self.output_commitments,
            viewing_memo=self.viewing_memo,
        )

    def verify(self, verifying_key, merkle_root, timestamp) -> None:
        """(reference transfer.rs:345-400)"""
        pub = self.check_instance_and_get_public_input(merkle_root, timestamp)
        if not transfer_proof.verify(
            verifying_key, pub, self.proof,
            self.aux_info.txn_memo_ver_key, self.aux_info.extra_proof_bound_data,
        ):
            raise FailedSnarkError("transfer proof verification failed")

    def nullifiers(self) -> list:
        return list(self.inputs_nullifiers)

    def merkle_root(self) -> int:
        return self.aux_info.merkle_root


def _get_transfer_asset_def(inputs, outputs) -> AssetDefinition:
    """The unique non-native asset among non-fee records, else native
    (reference utils/mod.rs:36-57)."""
    defs = set()
    for inp in inputs:
        ro = inp.ro if isinstance(inp, TransferNoteInput) else inp
        if not (ro.asset_def.is_native() or ro.is_dummy()):
            defs.add(ro.asset_def)
    for ro in outputs:
        if not ro.asset_def.is_native():
            defs.add(ro.asset_def)
    if len(defs) > 1:
        raise InvalidParameterError("more than one non-native asset in transfer")
    return defs.pop() if defs else AssetDefinition.native()


def _check_policy_rules(asset_def: AssetDefinition) -> None:
    """freezer policy requires viewer policy (utils/mod.rs:420-472)."""
    pol = asset_def.policy
    if pol.is_freezer_set() and not pol.is_viewer_set():
        raise InvalidParameterError("freezer policy requires a viewer policy")
