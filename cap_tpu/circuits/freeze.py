"""Freeze/unfreeze circuit (reference src/circuit/freeze.rs twin).

Statement for n_in inputs at depth d (constraints mirror
circuit/freeze.rs:74-178):
  * input[0]/output[0] are the native fee input/change with dummy policy,
    unfrozen, same owner, balance in0 == out0 + fee, prove_spend as USER;
  * each freeze leg i >= 1: freeze flag flipped (in+out == 1), amount /
    owner / asset / policy preserved, output commitment public, freezer key
    non-neutral unless the record is dummy, prove_spend as FREEZER (a
    zero secret key spends the neutral freezer key of dummy legs), root
    equality OR dummy.

Public input order: [root, native_ac, fee, nullifiers..., commitments...]
(reference proof/freeze.rs:331-344).
"""

from __future__ import annotations

from cap_tpu.constants import DUMMY_ASSET_CODE, NATIVE_ASSET_CODE
from cap_tpu.plonk.circuit import PlonkCircuit
from cap_tpu.plonk.gadgets import ecc
from cap_tpu.plonk.gadgets.merkle import create_acc_member_witness_var
from cap_tpu.circuits.gadgets import Spender, prove_spend
from cap_tpu.circuits.mint import enforce_dummy_policy
from cap_tpu.circuits.structs import RecordOpeningVar


def build_freeze_circuit(witness, pub_input, n_in: int, depth: int) -> PlonkCircuit:
    """witness: proof.freeze.FreezeWitness; pub_input: FreezePublicInput."""
    c = PlonkCircuit()
    assert len(witness.input_ros) == n_in and len(witness.output_ros) == n_in

    in_ros = [RecordOpeningVar.new(c, ro) for ro in witness.input_ros]
    out_ros = [RecordOpeningVar.new(c, ro) for ro in witness.output_ros]
    wits = [
        create_acc_member_witness_var(c, w, depth)
        for w in witness.acc_member_witnesses
    ]
    fee_sk = c.load(witness.fee_sk)
    frz_sks = [c.load(s) for s in witness.freezing_sks]

    root_pub = c.load(pub_input.merkle_root)
    native_ac = c.constant(NATIVE_ASSET_CODE)
    fee = c.load(pub_input.fee)

    nullifier_vars = []
    comm_vars = []

    # --- fee leg -------------------------------------------------------------
    fi, fo = in_ros[0], out_ros[0]
    for ro in (fi, fo):
        c.enforce_constant(ro.asset_code, NATIVE_ASSET_CODE)
        enforce_dummy_policy(c, ro.policy)
        c.enforce_false(ro.freeze_flag)
    ecc.enforce_point_equal(c, fo.owner, fi.owner)
    c.add_gate(fo.amount, fee, fi.amount)
    spend0 = prove_spend(c, fi, wits[0], fee_sk, Spender.USER)
    nullifier_vars.append(spend0.nullifier)
    comm_vars.append(fo.derive_record_commitment(c))
    c.enforce_equal(root_pub, spend0.root)

    # --- freeze legs ---------------------------------------------------------
    for i in range(1, n_in):
        ri, ro = in_ros[i], out_ros[i]
        # flipped flag: in + out == 1
        c.custom_gate([ri.freeze_flag, ro.freeze_flag, 0, 0, 0], lc0=1, lc1=1, c=-1)
        # record preserved
        c.enforce_equal(ro.amount, ri.amount)
        ecc.enforce_point_equal(c, ro.owner, ri.owner)
        c.enforce_equal(ro.asset_code, ri.asset_code)
        ro.policy.enforce_equal(c, ri.policy)

        b_dummy = c.is_equal(ri.asset_code, _const(c, DUMMY_ASSET_CODE))
        # freezer key must be set unless dummy
        has_freezer = c.logic_neg(ecc.is_neutral_point(c, ri.policy.freezer_pk))
        c.logic_or_gate(b_dummy, has_freezer)
        # dummy => amount 0
        c.custom_gate([b_dummy, ri.amount, 0, 0, 0], mul0=1)

        spend = prove_spend(c, ri, wits[i], frz_sks[i - 1], Spender.FREEZER)
        nullifier_vars.append(spend.nullifier)
        comm_vars.append(ro.derive_record_commitment(c))
        root_ok = c.is_equal(root_pub, spend.root)
        c.logic_or_gate(root_ok, b_dummy)

    # --- public binding ------------------------------------------------------
    c.set_variable_public(root_pub)
    c.set_variable_public(native_ac)
    c.set_variable_public(fee)
    for v in nullifier_vars:
        c.set_variable_public(v)
    for v in comm_vars:
        c.set_variable_public(v)
    return c


def _const(c: PlonkCircuit, v: int) -> int:
    return c.constant(v)


def extract_inputs(witness, pub_input, n_in: int, depth: int) -> list:
    """Leaf inputs for the witness tape, in build_freeze_circuit load order."""
    from cap_tpu.circuits.structs import acc_wit_inputs, ro_inputs

    out = []
    for ro in witness.input_ros:
        out += ro_inputs(ro)
    for ro in witness.output_ros:
        out += ro_inputs(ro)
    for w in witness.acc_member_witnesses:
        out += acc_wit_inputs(w, depth)
    out.append(witness.fee_sk)
    out += list(witness.freezing_sks)
    out += [pub_input.merkle_root, pub_input.fee]
    return out
