"""Mint proof orchestration (reference src/proof/mint.rs twin).

MintWitness / MintPublicInput assembly, circuit-shape-keyed proving and
verifying keys, preprocess / prove / verify.  The transcript binds the
receiver-memo verification key via the ext_msg hook (proof/mint.rs:97-140).
"""

from __future__ import annotations

from dataclasses import dataclass

from cap_tpu.circuits.mint import build_mint_circuit
from cap_tpu.crypto import jubjub
from cap_tpu.crypto.merkle import AccMemberWitness, MerkleTree
from cap_tpu.errors import FailedConstraintSystemError
from cap_tpu.fields.host import FR
from cap_tpu.plonk import prover as plonk_prover, verifier as plonk_verifier
from cap_tpu.plonk.structs import PlonkProof
from cap_tpu.structs import (
    AssetCode,
    AssetCodeSeed,
    AssetDefinition,
    AssetPolicy,
    InternalAssetCode,
    RecordOpening,
    ViewableMemo,
    asset_code_digest,
)
from cap_tpu.utils.serde import te_point_to_bytes


@dataclass
class MintProvingKey:
    plonk_pk: object
    tree_depth: int

    @property
    def vk(self) -> "MintVerifyingKey":
        return MintVerifyingKey(self.plonk_pk.vk, self.tree_depth)


@dataclass
class MintVerifyingKey:
    plonk_vk: object
    tree_depth: int


@dataclass
class MintWitness:
    """(reference proof/mint.rs:143-178)"""

    fee_ro: RecordOpening
    acc_member_witness: AccMemberWitness
    fee_sk: int                       # fee owner's spend secret key
    mint_ro: RecordOpening
    chg_ro: RecordOpening
    ac_seed: int
    ac_digest: int
    viewing_memo_enc_rand: int

    @staticmethod
    def dummy(tree_depth: int) -> "MintWitness":
        """Valid-shape witness for preprocessing (proof/mint.rs:155-178)."""
        from cap_tpu.keys import UserKeyPair
        from cap_tpu.utils.rng import CapRng

        rng = CapRng(b"cap-tpu mint dummy witness")
        kp = UserKeyPair.generate(rng)
        fee_ro = RecordOpening.new(rng, 0, AssetDefinition.native(), kp.pub_key())
        tree = MerkleTree(tree_depth)
        uid = tree.push(fee_ro.derive_record_commitment())
        seed = AssetCodeSeed.generate(rng)
        desc = b"dummy"
        code, _ = AssetCode.new_domestic(seed, desc)
        mint_ro = RecordOpening.new(
            rng, 0, AssetDefinition(code, AssetPolicy()), kp.pub_key()
        )
        chg_ro = RecordOpening.new(rng, 0, AssetDefinition.native(), kp.pub_key())
        return MintWitness(
            fee_ro=fee_ro,
            acc_member_witness=AccMemberWitness.lookup_from_tree(tree, uid),
            fee_sk=kp.addr_keypair.sk,
            mint_ro=mint_ro,
            chg_ro=chg_ro,
            ac_seed=seed.value,
            ac_digest=asset_code_digest(desc),
            viewing_memo_enc_rand=jubjub.rand_scalar(rng),
        )


@dataclass
class MintPublicInput:
    """(reference proof/mint.rs:183-277)"""

    merkle_root: int
    native_asset_code: int
    input_nullifier: object           # structs.Nullifier
    fee: int
    mint_rc: object                   # RecordCommitment
    chg_rc: object
    mint_amount: int
    mint_ac: AssetCode
    mint_internal_ac: InternalAssetCode
    mint_policy: AssetPolicy
    viewing_memo: ViewableMemo

    @staticmethod
    def from_witness(witness: MintWitness, fee: int) -> "MintPublicInput":
        from cap_tpu.keys import NullifierKey, UserKeyPair
        from cap_tpu.structs import RecordCommitment, Nullifier
        from cap_tpu.crypto.rescue import RescuePRF

        w = witness
        # fee input nullifier via the user's key (policy freezer is dummy)
        freezer_pk = w.fee_ro.asset_def.policy.freezer_pk
        if freezer_pk.is_neutral():
            nk = NullifierKey(w.fee_sk % FR.p)
        else:
            nk = NullifierKey.from_dh(freezer_pk, w.fee_sk)
        comm = RecordCommitment.from_ro(w.fee_ro)
        nullifier = nk.nullify(w.acc_member_witness.uid, comm)
        internal = InternalAssetCode(
            RescuePRF(1, 1, FR).eval(w.ac_seed, [w.ac_digest])[0]
        )
        memo = ViewableMemo.new_for_mint_note(w.mint_ro, w.viewing_memo_enc_rand)
        return MintPublicInput(
            merkle_root=w.acc_member_witness.root,
            native_asset_code=1,
            input_nullifier=nullifier,
            fee=fee,
            mint_rc=RecordCommitment.from_ro(w.mint_ro),
            chg_rc=RecordCommitment.from_ro(w.chg_ro),
            mint_amount=w.mint_ro.amount,
            mint_ac=w.mint_ro.asset_def.code,
            mint_internal_ac=internal,
            mint_policy=w.mint_ro.asset_def.policy,
            viewing_memo=memo,
        )

    def to_scalars(self) -> list:
        """(reference proof/mint.rs:262-277) — order mirrored by the circuit."""
        return (
            [
                self.merkle_root,
                self.native_asset_code,
                self.input_nullifier.value,
                self.fee,
                self.mint_rc.value,
                self.chg_rc.value,
                self.mint_amount,
                self.mint_ac.value,
                self.mint_internal_ac.value,
            ]
            + self.mint_policy.to_scalars()
            + self.viewing_memo.to_scalars()
        )


def preprocess(srs, tree_depth: int):
    """Build (MintProvingKey, MintVerifyingKey) (proof/mint.rs:69-93)."""
    wit = MintWitness.dummy(tree_depth)
    pub = MintPublicInput.from_witness(wit, fee=0)
    circuit = build_mint_circuit(wit, pub, tree_depth)
    pk, vk = plonk_prover.preprocess(srs, circuit)
    return MintProvingKey(pk, tree_depth), MintVerifyingKey(vk, tree_depth)


def _ext_msg(txn_memo_ver_key) -> bytes:
    return te_point_to_bytes(txn_memo_ver_key)


def prove(rng, proving_key: MintProvingKey, witness: MintWitness,
          pub_input: MintPublicInput, txn_memo_ver_key) -> PlonkProof:
    """(reference proof/mint.rs:97-120)"""
    import os

    from cap_tpu.circuits.mint import extract_inputs
    from cap_tpu.proof import tape_cache

    depth = proving_key.tree_depth
    pubs = [v % FR.p for v in pub_input.to_scalars()]
    if os.environ.get("CAP_PROVE_SAT_CHECK", "0") == "1":
        circuit = build_mint_circuit(witness, pub_input, depth)
        if circuit.public_input() != pubs:
            raise FailedConstraintSystemError("public input mismatch with circuit")
        if not circuit.check_circuit_satisfiability(pubs):
            raise FailedConstraintSystemError("mint circuit not satisfied")
        wvals = circuit.witness_values
    else:
        # default: tape replay; the prover's device-side quotient-tail check
        # rejects unsatisfiable witnesses without the Python row sweep
        wvals = tape_cache.witness_via_tape(
            ("mint", depth),
            lambda: build_mint_circuit(witness, pub_input, depth),
            lambda: extract_inputs(witness, pub_input, depth),
            pubs,
        )
    return plonk_prover.prove(
        rng, proving_key.plonk_pk, wvals, pubs,
        ext_msg=_ext_msg(txn_memo_ver_key),
    )


def verify(verifying_key: MintVerifyingKey, pub_input: MintPublicInput,
           proof: PlonkProof, txn_memo_ver_key) -> bool:
    """(reference proof/mint.rs:125-140)"""
    return plonk_verifier.verify(
        verifying_key.plonk_vk, pub_input.to_scalars(), proof,
        ext_msg=_ext_msg(txn_memo_ver_key),
    )
