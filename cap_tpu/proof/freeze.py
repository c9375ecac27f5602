"""Freeze proof orchestration (reference src/proof/freeze.rs twin)."""

from __future__ import annotations

from dataclasses import dataclass

from cap_tpu.circuits.freeze import build_freeze_circuit
from cap_tpu.crypto.merkle import AccMemberWitness, MerkleTree
from cap_tpu.errors import FailedConstraintSystemError, InvalidParameterError
from cap_tpu.fields.host import FR
from cap_tpu.plonk import prover as plonk_prover, verifier as plonk_verifier
from cap_tpu.plonk.structs import PlonkProof
from cap_tpu.structs import AssetDefinition, RecordOpening
from cap_tpu.utils.serde import te_point_to_bytes


@dataclass
class FreezeProvingKey:
    plonk_pk: object
    n_inputs: int
    tree_depth: int

    @property
    def vk(self) -> "FreezeVerifyingKey":
        return FreezeVerifyingKey(self.plonk_pk.vk, self.n_inputs, self.tree_depth)


@dataclass
class FreezeVerifyingKey:
    plonk_vk: object
    n_inputs: int
    tree_depth: int


@dataclass
class FreezeWitness:
    """(reference proof/freeze.rs:182-243)"""

    input_ros: list            # [0] fee input
    acc_member_witnesses: list
    output_ros: list           # [0] fee change; [i>0] flipped-flag clones
    fee_sk: int
    freezing_sks: list         # per freeze leg; 0 for dummy legs

    @staticmethod
    def dummy(n_inputs: int, tree_depth: int) -> "FreezeWitness":
        from cap_tpu.keys import FreezerKeyPair, UserKeyPair
        from cap_tpu.structs import AssetCode, AssetPolicy, BlindFactor
        from cap_tpu.utils.rng import CapRng
        import dataclasses

        rng = CapRng(b"cap-tpu freeze dummy witness")
        kp = UserKeyPair.generate(rng)
        frz = FreezerKeyPair.generate(rng)
        fee_ro = RecordOpening.new(rng, 0, AssetDefinition.native(), kp.pub_key())
        tree = MerkleTree(tree_depth)
        uid = tree.push(fee_ro.derive_record_commitment())
        wit0 = AccMemberWitness.lookup_from_tree(tree, uid)
        code, _ = AssetCode.random(rng)
        asset = AssetDefinition(
            code, AssetPolicy().set_freezer_pub_key(frz.pub_key())
        )
        ins = [fee_ro]
        sks = []
        uids = []
        for _ in range(n_inputs - 1):
            ro = RecordOpening.new(rng, 0, asset, kp.pub_key())
            ins.append(ro)
            uids.append(tree.push(ro.derive_record_commitment()))
            sks.append(frz.sk)
        # look paths up after all insertions so every witness shares the root
        wits = [AccMemberWitness.lookup_from_tree(tree, 0)]
        wits += [AccMemberWitness.lookup_from_tree(tree, u) for u in uids]
        outs = [RecordOpening.new(rng, 0, AssetDefinition.native(), kp.pub_key())]
        outs += get_output_ros(rng, ins[1:])
        return FreezeWitness(ins, wits, outs, kp.addr_keypair.sk, sks)


def get_output_ros(rng, input_ros) -> list:
    """Flip freeze flags with fresh blinds (reference utils/mod.rs:586-599)."""
    import dataclasses

    from cap_tpu.structs import BlindFactor

    return [
        dataclasses.replace(
            ro, freeze_flag=1 - ro.freeze_flag, blind=BlindFactor.rand(rng)
        )
        for ro in input_ros
    ]


@dataclass
class FreezePublicInput:
    """(reference proof/freeze.rs:247-344)"""

    merkle_root: int
    native_asset_code: int
    fee: int
    input_nullifiers: list
    output_commitments: list

    @staticmethod
    def from_witness(witness: FreezeWitness, fee: int) -> "FreezePublicInput":
        from cap_tpu.keys import NullifierKey
        from cap_tpu.structs import RecordCommitment

        w = witness
        if len(w.input_ros) != len(w.output_ros) or len(w.input_ros) != len(
            w.acc_member_witnesses
        ):
            raise InvalidParameterError("freeze witness length mismatch")
        if len(w.freezing_sks) != len(w.input_ros) - 1:
            raise InvalidParameterError("freeze witness key count mismatch")
        nullifiers = []
        # fee leg: user-side nullifier
        nk = NullifierKey(w.fee_sk % FR.p)
        comm0 = RecordCommitment.from_ro(w.input_ros[0])
        nullifiers.append(nk.nullify(w.acc_member_witnesses[0].uid, comm0))
        # freeze legs: freezer-side DH with the record owner
        for ro, wit, sk in zip(w.input_ros[1:], w.acc_member_witnesses[1:], w.freezing_sks):
            nk = NullifierKey.from_dh(ro.pub_key.address, sk)
            comm = RecordCommitment.from_ro(ro)
            nullifiers.append(nk.nullify(wit.uid, comm))
        commitments = [RecordCommitment.from_ro(ro) for ro in w.output_ros]
        root = w.acc_member_witnesses[0].root
        return FreezePublicInput(
            merkle_root=root,
            native_asset_code=1,
            fee=fee,
            input_nullifiers=nullifiers,
            output_commitments=commitments,
        )

    def to_scalars(self) -> list:
        return (
            [self.merkle_root, self.native_asset_code, self.fee]
            + [n.value for n in self.input_nullifiers]
            + [cm.value for cm in self.output_commitments]
        )


def dummy_freeze_circuit(n_inputs: int, tree_depth: int):
    wit = FreezeWitness.dummy(n_inputs, tree_depth)
    pub = FreezePublicInput.from_witness(wit, fee=0)
    return build_freeze_circuit(wit, pub, n_inputs, tree_depth)


def preprocess(srs, n_inputs: int, tree_depth: int):
    """(reference proof/freeze.rs:93-121)"""
    circuit = dummy_freeze_circuit(n_inputs, tree_depth)
    pk, vk = plonk_prover.preprocess(srs, circuit)
    return (
        FreezeProvingKey(pk, n_inputs, tree_depth),
        FreezeVerifyingKey(vk, n_inputs, tree_depth),
    )


def prove(rng, proving_key: FreezeProvingKey, witness: FreezeWitness,
          pub_input: FreezePublicInput, txn_memo_ver_key) -> PlonkProof:
    """(reference proof/freeze.rs:125-156)"""
    for ri, ro in zip(witness.input_ros[1:], witness.output_ros[1:]):
        if ri.freeze_flag + ro.freeze_flag != 1:
            raise InvalidParameterError("freeze output flags must be flipped")
    import os

    from cap_tpu.circuits.freeze import extract_inputs
    from cap_tpu.proof import tape_cache

    n_in, depth = proving_key.n_inputs, proving_key.tree_depth
    pubs = [v % FR.p for v in pub_input.to_scalars()]
    if os.environ.get("CAP_PROVE_SAT_CHECK", "0") == "1":
        circuit = build_freeze_circuit(witness, pub_input, n_in, depth)
        if circuit.public_input() != pubs:
            raise FailedConstraintSystemError("public input mismatch with circuit")
        if not circuit.check_circuit_satisfiability(pubs):
            raise FailedConstraintSystemError("freeze circuit not satisfied")
        wvals = circuit.witness_values
    else:
        # default: tape replay; the prover's device-side quotient-tail check
        # rejects unsatisfiable witnesses without the Python row sweep
        wvals = tape_cache.witness_via_tape(
            ("freeze", n_in, depth),
            lambda: build_freeze_circuit(witness, pub_input, n_in, depth),
            lambda: extract_inputs(witness, pub_input, n_in, depth),
            pubs,
        )
    return plonk_prover.prove(
        rng, proving_key.plonk_pk, wvals, pubs,
        ext_msg=te_point_to_bytes(txn_memo_ver_key),
    )


def verify(verifying_key: FreezeVerifyingKey, pub_input: FreezePublicInput,
           proof: PlonkProof, txn_memo_ver_key) -> bool:
    """(reference proof/freeze.rs:160-178)"""
    return plonk_verifier.verify(
        verifying_key.plonk_vk, pub_input.to_scalars(), proof,
        ext_msg=te_point_to_bytes(txn_memo_ver_key),
    )
