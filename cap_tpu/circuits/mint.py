"""Mint (asset issuance) circuit (reference src/circuit/mint.rs twin).

Statement (1 fee input, 2 outputs — fee change + minted record;
reference circuit/mint.rs:47-131):
  * fee input is spendable (prove_spend: ownership, accumulator membership,
    nullifier) and native with a dummy policy, unfrozen;
  * fee change is native, dummy policy, same owner, unfrozen;
  * fee balance: fee_in.amount == chg.amount + fee;
  * minted record: commitment opens to the public (amount, code, policy),
    amount in 2^127 range, unfrozen; the public internal asset code is
    PRF(seed; digest) for witnessed seed/digest;
  * viewing memo is a correct encryption of (owner.x, owner.y, blind) under
    the minted asset's viewer key, OR that key is neutral.

Public-input order must match proof.mint.MintPublicInput.to_scalars().
"""

from __future__ import annotations

from cap_tpu.constants import AMOUNT_LEN, NATIVE_ASSET_CODE
from cap_tpu.plonk.circuit import PlonkCircuit
from cap_tpu.plonk.gadgets import ecc, elgamal
from cap_tpu.plonk.gadgets.merkle import create_acc_member_witness_var
from cap_tpu.circuits.gadgets import Spender, prove_spend
from cap_tpu.circuits.gadgets_helper import derive_internal_asset_code
from cap_tpu.circuits.structs import AssetPolicyVar, RecordOpeningVar


def enforce_dummy_policy(c: PlonkCircuit, pol: AssetPolicyVar) -> None:
    """All keys neutral (0,1), reveal map 0, threshold 0."""
    for pt in (pol.viewer_pk, pol.cred_pk, pol.freezer_pk):
        c.enforce_constant(pt.x, 0)
        c.enforce_constant(pt.y, 1)
    c.enforce_constant(pol.reveal_map, 0)
    c.enforce_constant(pol.reveal_threshold, 0)


def build_mint_circuit(witness, pub_input, tree_depth: int) -> PlonkCircuit:
    """witness: proof.mint.MintWitness; pub_input: proof.mint.MintPublicInput."""
    c = PlonkCircuit()

    # --- witness variables ---------------------------------------------------
    fee_ro = RecordOpeningVar.new(c, witness.fee_ro)
    mint_ro = RecordOpeningVar.new(c, witness.mint_ro)
    chg_ro = RecordOpeningVar.new(c, witness.chg_ro)
    acc_wit = create_acc_member_witness_var(c, witness.acc_member_witness, tree_depth)
    sk = c.load(witness.fee_sk)
    seed = c.load(witness.ac_seed)
    digest = c.load(witness.ac_digest)
    rand = c.load(witness.viewing_memo_enc_rand)

    # --- core derivations ----------------------------------------------------
    spend = prove_spend(c, fee_ro, acc_wit, sk, Spender.USER)
    internal_ac = derive_internal_asset_code(c, seed, digest)
    mint_comm = mint_ro.derive_record_commitment(c)
    chg_comm = chg_ro.derive_record_commitment(c)
    memo_computed = elgamal.elgamal_encrypt(
        c, mint_ro.policy.viewer_pk, rand,
        [mint_ro.owner.x, mint_ro.owner.y, mint_ro.blind],
    )

    # --- public inputs (order == MintPublicInput.to_scalars()) --------------
    c.set_variable_public(spend.root)
    native_ac = c.constant(NATIVE_ASSET_CODE)
    c.set_variable_public(native_ac)
    c.set_variable_public(spend.nullifier)
    fee = c.load(pub_input.fee)
    c.set_variable_public(fee)
    c.set_variable_public(mint_comm)
    c.set_variable_public(chg_comm)
    c.set_variable_public(mint_ro.amount)
    c.set_variable_public(mint_ro.asset_code)
    c.set_variable_public(internal_ac)
    for v in mint_ro.policy.to_scalar_vars():
        c.set_variable_public(v)
    memo_pub = elgamal.create_ciphertext_variable(c, pub_input.viewing_memo.memo)
    elgamal.set_ciphertext_public(c, memo_pub)

    # --- constraints (see extract_inputs below for the tape load order) ------
    # fee input & change: native, dummy policy, unfrozen, same owner
    c.enforce_constant(fee_ro.asset_code, NATIVE_ASSET_CODE)
    c.enforce_constant(chg_ro.asset_code, NATIVE_ASSET_CODE)
    enforce_dummy_policy(c, fee_ro.policy)
    enforce_dummy_policy(c, chg_ro.policy)
    c.enforce_false(fee_ro.freeze_flag)
    c.enforce_false(chg_ro.freeze_flag)
    c.enforce_false(mint_ro.freeze_flag)
    ecc.enforce_point_equal(c, chg_ro.owner, fee_ro.owner)
    # fee balance: fee_in.amount == chg.amount + fee
    c.add_gate(chg_ro.amount, fee, fee_ro.amount)
    # mint amount range
    c.enforce_in_range(mint_ro.amount, AMOUNT_LEN)
    # memo correct OR dummy viewer
    eq = elgamal.check_ciphertext_equal(c, memo_computed, memo_pub)
    dummy_viewer = ecc.is_neutral_point(c, mint_ro.policy.viewer_pk)
    c.logic_or_gate(eq, dummy_viewer)

    return c


def extract_inputs(witness, pub_input, tree_depth: int) -> list:
    """Leaf inputs for the witness tape, in build_mint_circuit load order."""
    from cap_tpu.circuits.structs import acc_wit_inputs, ciphertext_inputs, ro_inputs

    out = []
    out += ro_inputs(witness.fee_ro)
    out += ro_inputs(witness.mint_ro)
    out += ro_inputs(witness.chg_ro)
    out += acc_wit_inputs(witness.acc_member_witness, tree_depth)
    out += [witness.fee_sk, witness.ac_seed, witness.ac_digest,
            witness.viewing_memo_enc_rand]
    out.append(pub_input.fee)
    out += ciphertext_inputs(pub_input.viewing_memo.memo)
    return out
