"""Test/bench fixture builders (reference src/utils/params_builder.rs twin).

`TxnsParams.generate_txns` mass-produces valid transfer/mint/freeze notes
sharing one Merkle tree and SRS (reference params_builder.rs:62-241); the
`*ParamsBuilder` classes expose the knobs the reference uses for negative
tests (amounts, policies, credentials, thresholds).
"""

from __future__ import annotations

from dataclasses import dataclass

from cap_tpu.constants import ATTRS_LEN
from cap_tpu.crypto.merkle import AccMemberWitness, MerkleTree
from cap_tpu.freeze import FreezeNote, FreezeNoteInput
from cap_tpu.keys import (
    CredIssuerKeyPair,
    FreezerKeyPair,
    UserKeyPair,
    ViewerKeyPair,
)
from cap_tpu.mint import MintNote
from cap_tpu.proof import freeze as freeze_proof, mint as mint_proof, transfer as transfer_proof
from cap_tpu.structs import (
    AssetCode,
    AssetCodeSeed,
    AssetDefinition,
    AssetPolicy,
    ExpirableCredential,
    FeeInput,
    IdentityAttribute,
    RecordOpening,
    TxnFeeInfo,
)
from cap_tpu.transfer import TransferNote, TransferNoteInput


@dataclass
class TransferParamsBuilder:
    """Configurable transfer fixture (reference params_builder.rs:288-903)."""

    rng: object
    n_inputs: int = 2
    n_outputs: int = 2
    tree_depth: int = 6
    input_amounts: list = None
    output_amounts: list = None
    fee: int = 1
    valid_until: int = 10
    with_viewer: bool = False
    with_credential: bool = False
    with_freezer: bool = False
    reveal_threshold: int = 0
    non_native: bool = False

    def __post_init__(self):
        rng = self.rng
        if self.input_amounts is None:
            self.input_amounts = [30] * (self.n_inputs - 1)
        if self.output_amounts is None:
            total = sum(self.input_amounts)
            per = total // (self.n_outputs - 1)
            self.output_amounts = [per] * (self.n_outputs - 2) + [
                total - per * (self.n_outputs - 2)
            ]
        self.users = [UserKeyPair.generate(rng) for _ in range(self.n_inputs)]
        self.recv = UserKeyPair.generate(rng)
        self.viewer = ViewerKeyPair.generate(rng)
        self.freezer = FreezerKeyPair.generate(rng)
        self.issuer = CredIssuerKeyPair.generate(rng)
        pol = AssetPolicy()
        if self.with_viewer:
            pol = pol.set_viewer_pub_key(self.viewer.pub_key()).reveal_record_opening()
            if self.reveal_threshold:
                pol = pol.set_reveal_threshold(self.reveal_threshold)
        if self.with_credential:
            pol = pol.set_cred_creator_pub_key(self.issuer.pub_key()).reveal_all_attributes()
        if self.with_freezer:
            if not self.with_viewer:
                pol = pol.set_viewer_pub_key(self.viewer.pub_key()).reveal_record_opening()
            pol = pol.set_freezer_pub_key(self.freezer.pub_key())
        if self.non_native:
            code, self.seed = AssetCode.random(rng)
            self.asset_def = AssetDefinition.new(code, pol)
        else:
            self.asset_def = AssetDefinition.native()
        self._build_records()

    def _build_records(self):
        rng = self.rng
        self.tree = MerkleTree(self.tree_depth)
        fee_amt = 20
        self.fee_ro = RecordOpening.new(
            rng, fee_amt, AssetDefinition.native(), self.users[0].pub_key()
        )
        uids = [self.tree.push(self.fee_ro.derive_record_commitment())]
        self.input_ros = []
        for amt, user in zip(self.input_amounts, self.users[1:]):
            ro = RecordOpening.new(
                rng, amt,
                self.asset_def if self.non_native else AssetDefinition.native(),
                user.pub_key(),
            )
            self.input_ros.append(ro)
            uids.append(self.tree.push(ro.derive_record_commitment()))
        self.uids = uids
        self.creds = []
        for user in self.users[1:]:
            if self.with_credential:
                attrs = [IdentityAttribute.random(rng) for _ in range(ATTRS_LEN)]
                self.creds.append(
                    ExpirableCredential.create(
                        user.address(), attrs,
                        self.valid_until + 10, self.issuer.keypair, rng,
                    )
                )
            else:
                self.creds.append(None)

    def build_inputs_and_outputs(self):
        rng = self.rng
        inputs = [
            TransferNoteInput(
                ro=self.fee_ro,
                acc_member_witness=AccMemberWitness.lookup_from_tree(self.tree, self.uids[0]),
                owner_keypair=self.users[0],
            )
        ]
        for i, (ro, user, cred) in enumerate(
            zip(self.input_ros, self.users[1:], self.creds)
        ):
            inputs.append(
                TransferNoteInput(
                    ro=ro,
                    acc_member_witness=AccMemberWitness.lookup_from_tree(
                        self.tree, self.uids[i + 1]
                    ),
                    owner_keypair=user,
                    cred=cred,
                )
            )
        out_asset = self.asset_def if self.non_native else AssetDefinition.native()
        outputs = [
            RecordOpening.new(rng, amt, out_asset, self.recv.pub_key())
            for amt in self.output_amounts
        ]
        return inputs, outputs

    # -- mutation hooks (reference params_builder.rs:288-903) ----------------
    # Each produces a NEAR-VALID state: everything is internally consistent
    # except the one mutated fact, so negative tests prove the circuit (or
    # the host validation pipeline) catches exactly that fact.

    def update_input_amount(self, idx: int, amount: int) -> None:
        """Change a non-fee input's amount AFTER its commitment was pushed:
        the record no longer matches the accumulated leaf, so the in-circuit
        Merkle-root recompute must fail (reference update_input_amount)."""
        import dataclasses

        self.input_ros[idx] = dataclasses.replace(self.input_ros[idx], amount=amount)

    def update_output_amount(self, idx: int, amount: int) -> None:
        self.output_amounts[idx] = amount

    def update_fee(self, fee: int) -> None:
        self.fee = fee

    def update_valid_until(self, t: int) -> None:
        self.valid_until = t

    def update_acc_member_witness(self, idx: int, witness=None) -> "AccMemberWitness":
        """Replace input idx's Merkle witness with a stale/foreign one (the
        fee input is idx 0).  Default: the witness of a DIFFERENT leaf."""
        other = (idx + 1) % len(self.uids)
        wit = witness or AccMemberWitness.lookup_from_tree(self.tree, self.uids[other])
        self._witness_overrides = getattr(self, "_witness_overrides", {})
        self._witness_overrides[idx] = wit
        return wit

    def set_dummy_input_record(self, idx: int) -> None:
        """Turn a non-fee input into a dummy record WITHOUT zeroing its
        amount — dummy records must carry amount 0 (circuit/transfer.rs:78)."""
        import dataclasses

        ro = self.input_ros[idx]
        self.input_ros[idx] = dataclasses.replace(
            ro, asset_def=AssetDefinition.dummy()
        )

    def set_input_frozen(self, idx: int) -> None:
        import dataclasses

        from cap_tpu.structs import FROZEN

        self.input_ros[idx] = dataclasses.replace(
            self.input_ros[idx], freeze_flag=FROZEN
        )

    def swap_input_owner(self, idx: int, keypair=None) -> None:
        """Spend input idx with a keypair that does NOT own the record
        (prove_spend address-derivation must fail)."""
        self.users[idx + 1] = keypair or UserKeyPair.generate(self.rng)

    def set_expired_credential(self, idx: int) -> None:
        """Re-issue input idx's credential already expired at valid_until."""
        attrs = [IdentityAttribute.random(self.rng) for _ in range(ATTRS_LEN)]
        self.creds[idx] = ExpirableCredential.create(
            self.users[idx + 1].address(), attrs,
            max(self.valid_until - 1, 0), self.issuer.keypair, self.rng,
        )

    def build_inputs_and_outputs_mutated(self):
        """build_inputs_and_outputs + any update_acc_member_witness overrides."""
        inputs, outputs = self.build_inputs_and_outputs()
        for idx, wit in getattr(self, "_witness_overrides", {}).items():
            inputs[idx] = TransferNoteInput(
                ro=inputs[idx].ro, acc_member_witness=wit,
                owner_keypair=inputs[idx].owner_keypair, cred=inputs[idx].cred,
            )
        return inputs, outputs

    def build_transfer_note(self, proving_key):
        inputs, outputs = self.build_inputs_and_outputs()
        if self.non_native:
            fee_input = FeeInput(
                self.fee_ro, inputs[0].acc_member_witness, self.users[0]
            )
            fee_info, _ = TxnFeeInfo.new(self.rng, fee_input, self.fee)
            note, kp = TransferNote.generate_non_native(
                self.rng, inputs[1:], outputs, fee_info, self.valid_until, proving_key
            )
            return note, kp, outputs
        note, kp, chg = TransferNote.generate_native(
            self.rng, inputs, outputs, self.fee, self.valid_until, proving_key
        )
        return note, kp, [chg] + outputs


@dataclass
class MintParamsBuilder:
    """(reference params_builder.rs:934-1153)"""

    rng: object
    tree_depth: int = 6
    mint_amount: int = 1000
    fee: int = 2
    with_viewer: bool = False

    def __post_init__(self):
        rng = self.rng
        self.minter = UserKeyPair.generate(rng)
        self.recv = UserKeyPair.generate(rng)
        self.viewer = ViewerKeyPair.generate(rng)
        self.seed = AssetCodeSeed.generate(rng)
        self.description = b"mint-params-builder asset"
        code, _ = AssetCode.new_domestic(self.seed, self.description)
        pol = AssetPolicy()
        if self.with_viewer:
            pol = pol.set_viewer_pub_key(self.viewer.pub_key()).reveal_record_opening()
        self.asset_def = AssetDefinition.new(code, pol)
        self.tree = MerkleTree(self.tree_depth)
        self.fee_ro = RecordOpening.new(
            rng, self.fee + 10, AssetDefinition.native(), self.minter.pub_key()
        )
        self.uid = self.tree.push(self.fee_ro.derive_record_commitment())

    # -- mutation hooks (reference params_builder.rs:934-1153) ---------------

    def update_mint_amount(self, amount: int) -> None:
        self.mint_amount = amount

    def update_fee(self, fee: int) -> None:
        self.fee = fee

    def wrong_asset_code_seed(self) -> None:
        """Witness seed no longer matches the asset definition's Keccak-bound
        code: the in-circuit PRF output diverges from the public internal
        code (reference mint negative grids)."""
        self.seed = AssetCodeSeed.generate(self.rng)

    def wrong_asset_description(self) -> None:
        self.description = self.description + b" (tampered)"

    def swap_minter(self, keypair=None) -> None:
        """Fee input spent by a non-owner keypair."""
        self.minter = keypair or UserKeyPair.generate(self.rng)

    def stale_fee_witness(self) -> "AccMemberWitness":
        """A witness for a different (freshly pushed) leaf."""
        extra = RecordOpening.new(
            self.rng, 1, AssetDefinition.native(), self.recv.pub_key()
        )
        uid = self.tree.push(extra.derive_record_commitment())
        return AccMemberWitness.lookup_from_tree(self.tree, uid)

    def build_mint_note(self, proving_key):
        rng = self.rng
        fee_input = FeeInput(
            self.fee_ro,
            AccMemberWitness.lookup_from_tree(self.tree, self.uid),
            self.minter,
        )
        fee_info, chg = TxnFeeInfo.new(rng, fee_input, self.fee)
        mint_ro = RecordOpening.new(
            rng, self.mint_amount, self.asset_def, self.recv.pub_key()
        )
        note, kp = MintNote.generate(
            rng, mint_ro, self.seed, self.description, fee_info, proving_key
        )
        return note, kp, mint_ro, chg


@dataclass
class FreezeParamsBuilder:
    """(reference params_builder.rs:1156-1389)"""

    rng: object
    n_inputs: int = 2  # including the fee input
    tree_depth: int = 6
    fee: int = 1

    def __post_init__(self):
        rng = self.rng
        self.fee_payer = UserKeyPair.generate(rng)
        self.owner = UserKeyPair.generate(rng)
        self.viewer = ViewerKeyPair.generate(rng)
        self.freezer = FreezerKeyPair.generate(rng)
        code, _ = AssetCode.random(rng)
        pol = (
            AssetPolicy()
            .set_viewer_pub_key(self.viewer.pub_key())
            .reveal_record_opening()
            .set_freezer_pub_key(self.freezer.pub_key())
        )
        self.asset_def = AssetDefinition.new(code, pol)
        self.tree = MerkleTree(self.tree_depth)
        self.fee_ro = RecordOpening.new(
            rng, self.fee + 5, AssetDefinition.native(), self.fee_payer.pub_key()
        )
        self.fee_uid = self.tree.push(self.fee_ro.derive_record_commitment())
        self.freeze_ros = []
        self.freeze_uids = []
        for _ in range(self.n_inputs - 1):
            ro = RecordOpening.new(rng, 40, self.asset_def, self.owner.pub_key())
            self.freeze_ros.append(ro)
            self.freeze_uids.append(self.tree.push(ro.derive_record_commitment()))

    # -- mutation hooks (reference params_builder.rs:1156-1389) --------------

    def update_fee(self, fee: int) -> None:
        self.fee = fee

    def update_input_amount(self, idx: int, amount: int) -> None:
        """Change a freeze leg's amount after its commitment was accumulated
        (stale leaf — in-circuit root recompute must fail)."""
        import dataclasses

        self.freeze_ros[idx] = dataclasses.replace(self.freeze_ros[idx], amount=amount)

    def swap_freezer(self, keypair=None) -> None:
        """Freeze with a keypair that does not match the records' policy."""
        self.freezer = keypair or FreezerKeyPair.generate(self.rng)

    def stale_leg_witness(self, idx: int) -> "AccMemberWitness":
        """The witness of a different leaf, for leg idx."""
        other_uid = self.fee_uid if idx != 0 or len(self.freeze_uids) == 1 else self.freeze_uids[1]
        return AccMemberWitness.lookup_from_tree(self.tree, other_uid)

    def build_freeze_note(self, proving_key):
        rng = self.rng
        fee_input = FeeInput(
            self.fee_ro,
            AccMemberWitness.lookup_from_tree(self.tree, self.fee_uid),
            self.fee_payer,
        )
        fee_info, chg = TxnFeeInfo.new(rng, fee_input, self.fee)
        inputs = [
            FreezeNoteInput(
                ro=ro,
                acc_member_witness=AccMemberWitness.lookup_from_tree(self.tree, uid),
                keypair=self.freezer,
            )
            for ro, uid in zip(self.freeze_ros, self.freeze_uids)
        ]
        note, kp, outputs = FreezeNote.generate(rng, inputs, fee_info, proving_key)
        return note, kp, outputs, chg


@dataclass
class TxnsParams:
    """Shared-SRS heterogeneous note fixture (params_builder.rs:62-241)."""

    srs: object
    txns: list          # list of lib.TransactionNote
    verifying_keys: list
    merkle_roots: list
    valid_until: int

    @staticmethod
    def generate_txns(rng, num_transfer: int, num_mint: int, num_freeze: int,
                      tree_depth: int = 6):
        from cap_tpu.lib import TransactionNote
        from cap_tpu.proof import universal_setup_for_staging

        max_degree = 2**15 + 2
        srs = universal_setup_for_staging(max_degree, "data")
        txns, vks, roots = [], [], []
        valid_until = 10
        if num_transfer:
            pk, vk = transfer_proof.preprocess(srs, 2, 2, tree_depth)
            for _ in range(num_transfer):
                b = TransferParamsBuilder(rng, 2, 2, tree_depth)
                note, _, _ = b.build_transfer_note(pk)
                txns.append(TransactionNote.transfer(note))
                vks.append(vk)
                roots.append(b.tree.root)
        if num_mint:
            pk, vk = mint_proof.preprocess(srs, tree_depth)
            for _ in range(num_mint):
                b = MintParamsBuilder(rng, tree_depth)
                note, _, _, _ = b.build_mint_note(pk)
                txns.append(TransactionNote.mint(note))
                vks.append(vk)
                roots.append(b.tree.root)
        if num_freeze:
            pk, vk = freeze_proof.preprocess(srs, 2, tree_depth)
            for _ in range(num_freeze):
                b = FreezeParamsBuilder(rng, 2, tree_depth)
                note, _, _, _ = b.build_freeze_note(pk)
                txns.append(TransactionNote.freeze(note))
                vks.append(vk)
                roots.append(b.tree.root)
        return TxnsParams(srs, txns, vks, roots, valid_until)
