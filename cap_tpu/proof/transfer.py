"""Transfer proof orchestration (reference src/proof/transfer.rs twin)."""

from __future__ import annotations

from dataclasses import dataclass

from cap_tpu.circuits.transfer import build_transfer_circuit
from cap_tpu.crypto import jubjub
from cap_tpu.crypto.merkle import AccMemberWitness, MerkleTree
from cap_tpu.errors import FailedConstraintSystemError
from cap_tpu.fields.host import FR
from cap_tpu.plonk import prover as plonk_prover, verifier as plonk_verifier
from cap_tpu.plonk.structs import PlonkProof
from cap_tpu.structs import (
    AssetDefinition,
    ExpirableCredential,
    RecordOpening,
    ViewableMemo,
)
from cap_tpu.utils.serde import te_point_to_bytes


@dataclass
class TransferProvingKey:
    plonk_pk: object
    n_inputs: int
    n_outputs: int
    tree_depth: int

    @property
    def vk(self) -> "TransferVerifyingKey":
        return TransferVerifyingKey(
            self.plonk_pk.vk, self.n_inputs, self.n_outputs, self.tree_depth
        )


@dataclass
class TransferVerifyingKey:
    plonk_vk: object
    n_inputs: int
    n_outputs: int
    tree_depth: int


@dataclass
class InputSecret:
    """One input's spending secrets (reference TransferNoteInput flattened)."""

    ro: RecordOpening
    acc_member_witness: AccMemberWitness
    sk: int                              # owner spend secret key
    cred: ExpirableCredential            # dummy_unexpired if absent

    @staticmethod
    def normalize_cred(cred) -> ExpirableCredential:
        return cred if cred is not None else ExpirableCredential.dummy_unexpired()


@dataclass
class TransferWitness:
    """(reference proof/transfer.rs:216-305)"""

    asset_def: AssetDefinition           # shared non-fee asset definition
    input_secrets: list                  # [0] is the fee input
    output_ros: list                     # [0] is the fee change
    viewing_memo_enc_rand: int

    @staticmethod
    def dummy(n_inputs: int, n_outputs: int, tree_depth: int) -> "TransferWitness":
        """Witness-independent-shape dummy (proof/transfer.rs:224-262)."""
        from cap_tpu.keys import UserKeyPair
        from cap_tpu.structs import AssetCode, AssetPolicy
        from cap_tpu.utils.rng import CapRng

        rng = CapRng(b"cap-tpu transfer dummy witness")
        kp = UserKeyPair.generate(rng)
        fee_ro = RecordOpening.new(rng, 0, AssetDefinition.native(), kp.pub_key())
        tree = MerkleTree(tree_depth)
        uid = tree.push(fee_ro.derive_record_commitment())
        wit = AccMemberWitness.lookup_from_tree(tree, uid)
        code, _ = AssetCode.random(rng)
        asset_def = AssetDefinition(code, AssetPolicy())
        dummy_cred = ExpirableCredential.dummy_unexpired()
        secrets = [InputSecret(fee_ro, wit, kp.addr_keypair.sk, dummy_cred)]
        for _ in range(n_inputs - 1):
            ro, rkp = RecordOpening.dummy(rng)
            secrets.append(
                InputSecret(ro, AccMemberWitness.dummy(tree_depth), rkp.addr_keypair.sk, dummy_cred)
            )
        outputs = [RecordOpening.new(rng, 0, AssetDefinition.native(), kp.pub_key())]
        for _ in range(n_outputs - 1):
            outputs.append(RecordOpening.new(rng, 0, asset_def, kp.pub_key()))
        return TransferWitness(asset_def, secrets, outputs, jubjub.rand_scalar(rng))


@dataclass
class TransferPublicInput:
    """(reference proof/transfer.rs:338-458)"""

    merkle_root: int
    native_asset_code: int
    valid_until: int
    fee: int
    input_nullifiers: list
    output_commitments: list
    viewing_memo: ViewableMemo

    @staticmethod
    def from_witness(witness: TransferWitness, fee: int, valid_until: int) -> "TransferPublicInput":
        from cap_tpu.keys import NullifierKey
        from cap_tpu.structs import Nullifier, RecordCommitment

        nullifiers = []
        root = None
        for sec in witness.input_secrets:
            freezer_pk = sec.ro.asset_def.policy.freezer_pk
            if freezer_pk.is_neutral():
                nk = NullifierKey(sec.sk % FR.p)
            else:
                nk = NullifierKey.from_dh(freezer_pk, sec.sk)
            comm = RecordCommitment.from_ro(sec.ro)
            nullifiers.append(nk.nullify(sec.acc_member_witness.uid, comm))
            if root is None and not sec.ro.is_dummy():
                root = sec.acc_member_witness.root
        if root is None:
            root = witness.input_secrets[0].acc_member_witness.root
        commitments = [RecordCommitment.from_ro(ro) for ro in witness.output_ros]
        memo = ViewableMemo.new_for_transfer_note(
            [(s.ro, s.cred) for s in witness.input_secrets],
            witness.output_ros,
            witness.asset_def,
            witness.viewing_memo_enc_rand,
        )
        return TransferPublicInput(
            merkle_root=root,
            native_asset_code=1,
            valid_until=valid_until,
            fee=fee,
            input_nullifiers=nullifiers,
            output_commitments=commitments,
            viewing_memo=memo,
        )

    def to_scalars(self) -> list:
        """(reference proof/transfer.rs:443-458)"""
        return (
            [self.merkle_root, self.native_asset_code, self.valid_until, self.fee]
            + [n.value for n in self.input_nullifiers]
            + [cm.value for cm in self.output_commitments]
            + self.viewing_memo.to_scalars()
        )


def dummy_transfer_circuit(n_inputs: int, n_outputs: int, tree_depth: int):
    wit = TransferWitness.dummy(n_inputs, n_outputs, tree_depth)
    pub = TransferPublicInput.from_witness(wit, fee=0, valid_until=0)
    return build_transfer_circuit(wit, pub, n_inputs, n_outputs, tree_depth)


def preprocess(srs, n_inputs: int, n_outputs: int, tree_depth: int):
    """(reference proof/transfer.rs:124-155)"""
    circuit = dummy_transfer_circuit(n_inputs, n_outputs, tree_depth)
    pk, vk = plonk_prover.preprocess(srs, circuit)
    return (
        TransferProvingKey(pk, n_inputs, n_outputs, tree_depth),
        TransferVerifyingKey(vk, n_inputs, n_outputs, tree_depth),
    )


def _ext_msg(txn_memo_ver_key, extra_proof_bound_data: bytes) -> bytes:
    return te_point_to_bytes(txn_memo_ver_key) + extra_proof_bound_data


def prepare_prove(proving_key: TransferProvingKey, witness: TransferWitness,
                  pub_input: TransferPublicInput, txn_memo_ver_key,
                  extra_proof_bound_data: bytes = b""):
    """Host stage of `prove`: witness values (tape replay), reduced public
    scalars, and the transcript ext message.  Everything after this is the
    device-side plonk pipeline — parallel/queue.py pipelines exactly at
    this seam (host prep of note i+1 overlaps device prove of note i)."""
    import os

    from cap_tpu.circuits.transfer import extract_inputs
    from cap_tpu.proof import tape_cache

    shape = (proving_key.n_inputs, proving_key.n_outputs, proving_key.tree_depth)
    pubs = [v % FR.p for v in pub_input.to_scalars()]
    if os.environ.get("CAP_PROVE_SAT_CHECK", "0") == "1":
        circuit = build_transfer_circuit(witness, pub_input, *shape)
        if circuit.public_input() != pubs:
            raise FailedConstraintSystemError("public input mismatch with circuit")
        if not circuit.check_circuit_satisfiability(pubs):
            raise FailedConstraintSystemError("transfer circuit not satisfied")
        wvals = circuit.witness_values
    else:
        # default: witness via tape replay (record-once per shape); the
        # prover's device-side quotient-tail check rejects unsatisfiable
        # witnesses without the Python row sweep
        wvals = tape_cache.witness_via_tape(
            ("transfer", *shape),
            lambda: build_transfer_circuit(witness, pub_input, *shape),
            lambda: extract_inputs(witness, pub_input, *shape),
            pubs,
        )
    return wvals, pubs, _ext_msg(txn_memo_ver_key, extra_proof_bound_data)


def prove(rng, proving_key: TransferProvingKey, witness: TransferWitness,
          pub_input: TransferPublicInput, txn_memo_ver_key,
          extra_proof_bound_data: bytes = b"") -> PlonkProof:
    """(reference proof/transfer.rs:159-188)"""
    wvals, pubs, ext = prepare_prove(
        proving_key, witness, pub_input, txn_memo_ver_key,
        extra_proof_bound_data,
    )
    return plonk_prover.prove(rng, proving_key.plonk_pk, wvals, pubs, ext_msg=ext)


def verify(verifying_key: TransferVerifyingKey, pub_input: TransferPublicInput,
           proof: PlonkProof, txn_memo_ver_key,
           extra_proof_bound_data: bytes = b"") -> bool:
    """(reference proof/transfer.rs:192-212)"""
    return plonk_verifier.verify(
        verifying_key.plonk_vk, pub_input.to_scalars(), proof,
        ext_msg=_ext_msg(txn_memo_ver_key, extra_proof_bound_data),
    )
