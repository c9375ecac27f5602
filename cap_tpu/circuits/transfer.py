"""Transfer circuit (reference src/circuit/transfer.rs twin).

Statement for an (n_in, n_out, depth) transfer (constraints list mirrors
circuit/transfer.rs:72-188, SURVEY.md §2.1 "Circuit: transfer"):

per input i:
  * unfrozen; dummy => amount 0;
  * i == 0 (the fee input): native asset with dummy policy;
    i > 0: (code, policy) equal the note's shared asset definition OR dummy;
  * prove_spend (ownership, commitment, nullifier-key DH with neutral
    fallback, nullifier, Merkle root recomputation);
  * public nullifier equals the computed one; recomputed root equals the
    public root OR the record is dummy (garbage paths allowed for dummies);
  * credential valid at `valid_until` OR the policy has no cred issuer.

per output j:
  * unfrozen; j == 0 (fee change): native + dummy policy;
    j > 0: (code, policy) equal the shared asset definition;
  * public commitment equals the recomputed one; amount in 2^127 range.

plus `preserve_balance` (one circuit for native and non-native) and the
threshold-gated viewing memo: (threshold - transfer_amount in range) OR
dummy viewer OR the public memo equals the in-circuit re-encryption.
"""

from __future__ import annotations

from cap_tpu.constants import (
    AMOUNT_LEN,
    DUMMY_ASSET_CODE,
    NATIVE_ASSET_CODE,
)
from cap_tpu.plonk.circuit import PlonkCircuit
from cap_tpu.plonk.gadgets import ecc, elgamal
from cap_tpu.plonk.gadgets.merkle import create_acc_member_witness_var
from cap_tpu.circuits.gadgets import Spender, preserve_balance, prove_spend
from cap_tpu.circuits.mint import enforce_dummy_policy
from cap_tpu.circuits.structs import (
    AssetPolicyVar,
    ExpirableCredVar,
    RecordOpeningVar,
)


def build_transfer_circuit(witness, pub_input, n_in: int, n_out: int, depth: int) -> PlonkCircuit:
    """witness: proof.transfer.TransferWitness;
    pub_input: proof.transfer.TransferPublicInput."""
    c = PlonkCircuit()
    assert len(witness.input_secrets) == n_in
    assert len(witness.output_ros) == n_out

    # --- witness variables ---------------------------------------------------
    shared_code = c.load(witness.asset_def.code.value)
    shared_policy = AssetPolicyVar.new(c, witness.asset_def.policy)
    in_ros = []
    in_wits = []
    in_sks = []
    in_creds = []
    for sec in witness.input_secrets:
        in_ros.append(RecordOpeningVar.new(c, sec.ro))
        in_wits.append(create_acc_member_witness_var(c, sec.acc_member_witness, depth))
        in_sks.append(c.load(sec.sk))
        in_creds.append(ExpirableCredVar.new(c, sec.cred))
    out_ros = [RecordOpeningVar.new(c, ro) for ro in witness.output_ros]
    rand = c.load(witness.viewing_memo_enc_rand)

    # --- public scalar vars (values bound later in to_scalars() order) ------
    root_pub = c.load(pub_input.merkle_root)
    native_ac = c.constant(NATIVE_ASSET_CODE)
    valid_until = c.load(pub_input.valid_until)
    fee = c.load(pub_input.fee)

    # --- per-input constraints ----------------------------------------------
    nullifier_vars = []
    for i in range(n_in):
        ro = in_ros[i]
        c.enforce_false(ro.freeze_flag)
        b_dummy = c.is_equal(ro.asset_code, _const(c, DUMMY_ASSET_CODE))
        # dummy => amount == 0
        c.custom_gate([b_dummy, ro.amount, 0, 0, 0], mul0=1)
        if i == 0:
            c.enforce_constant(ro.asset_code, NATIVE_ASSET_CODE)
            enforce_dummy_policy(c, ro.policy)
        else:
            eq_code = c.is_equal(ro.asset_code, shared_code)
            eq_pol = ro.policy.is_equal(c, shared_policy)
            c.logic_or_gate(b_dummy, c.logic_and(eq_code, eq_pol))

        spend = prove_spend(c, ro, in_wits[i], in_sks[i], Spender.USER)
        nullifier_vars.append(spend.nullifier)
        # root consistency OR dummy
        root_ok = c.is_equal(root_pub, spend.root)
        c.logic_or_gate(root_ok, b_dummy)

        # credential check OR no cred issuer in the policy
        cred = in_creds[i]
        no_cred = ecc.is_neutral_point(c, ro.policy.cred_pk)
        cred_ok = cred.verify_flag(c, valid_until)
        addr_ok = ecc.is_point_equal(c, cred.user_addr, ro.owner)
        issuer_ok = ecc.is_point_equal(c, cred.creator_pk, ro.policy.cred_pk)
        c.logic_or_gate(no_cred, c.logic_and_all([cred_ok, addr_ok, issuer_ok]))

    # --- per-output constraints ---------------------------------------------
    comm_vars = []
    for j in range(n_out):
        ro = out_ros[j]
        c.enforce_false(ro.freeze_flag)
        if j == 0:
            c.enforce_constant(ro.asset_code, NATIVE_ASSET_CODE)
            enforce_dummy_policy(c, ro.policy)
        else:
            c.enforce_equal(ro.asset_code, shared_code)
            ro.policy.enforce_equal(c, shared_policy)
        comm_vars.append(ro.derive_record_commitment(c))
        c.enforce_in_range(ro.amount, AMOUNT_LEN)

    # --- balance -------------------------------------------------------------
    is_native = c.is_equal(shared_code, native_ac)
    preserve_balance(
        c, is_native, fee,
        [ro.amount for ro in in_ros], [ro.amount for ro in out_ros],
    )

    # --- viewing memo (threshold-gated) --------------------------------------
    memo_pub = elgamal.create_ciphertext_variable(c, pub_input.viewing_memo.memo)
    transfer_amount = c.sum([ro.amount for ro in in_ros[1:]])
    d = c.sub(shared_policy.reveal_threshold, transfer_amount)
    b_below = c.check_in_range_conditional(d, AMOUNT_LEN)
    dummy_viewer = ecc.is_neutral_point(c, shared_policy.viewer_pk)
    memo_msg = _memo_plaintext(c, shared_code, shared_policy, in_ros, in_creds, out_ros)
    memo_computed = elgamal.elgamal_encrypt(c, shared_policy.viewer_pk, rand, memo_msg)
    memo_ok = elgamal.check_ciphertext_equal(c, memo_computed, memo_pub)
    c.logic_or_gate(c.logic_or(b_below, dummy_viewer), memo_ok)

    # --- public input binding (order == TransferPublicInput.to_scalars()) ----
    c.set_variable_public(root_pub)
    c.set_variable_public(native_ac)
    c.set_variable_public(valid_until)
    c.set_variable_public(fee)
    for v in nullifier_vars:
        c.set_variable_public(v)
    for v in comm_vars:
        c.set_variable_public(v)
    elgamal.set_ciphertext_public(c, memo_pub)
    return c


def _const(c: PlonkCircuit, v: int) -> int:
    return c.constant(v)


def extract_inputs(witness, pub_input, n_in: int, n_out: int, depth: int) -> list:
    """Leaf inputs for the witness tape, in build_transfer_circuit load
    order (tests assert this against a fresh build)."""
    from cap_tpu.circuits.structs import (
        acc_wit_inputs,
        ciphertext_inputs,
        cred_inputs,
        policy_inputs,
        ro_inputs,
    )

    out = [witness.asset_def.code.value]
    out += policy_inputs(witness.asset_def.policy)
    for sec in witness.input_secrets:
        out += ro_inputs(sec.ro)
        out += acc_wit_inputs(sec.acc_member_witness, depth)
        out.append(sec.sk)
        out += cred_inputs(sec.cred)
    for ro in witness.output_ros:
        out += ro_inputs(ro)
    out.append(witness.viewing_memo_enc_rand)
    out += [pub_input.merkle_root, pub_input.valid_until, pub_input.fee]
    out += ciphertext_inputs(pub_input.viewing_memo.memo)
    return out


def _memo_plaintext(c, shared_code, shared_policy, in_ros, in_creds, out_ros):
    """In-circuit twin of ViewableMemo.new_for_transfer_note's plaintext."""
    bits = shared_policy.reveal_map_bits  # 12 boolean vars, map order
    msg = [shared_code]
    for ro, cred in zip(in_ros[1:], in_creds[1:]):
        vals = [ro.owner.x, ro.owner.y, ro.amount, ro.blind] + list(cred.attrs)
        masked = [c.mul(b, v) for b, v in zip(bits, vals)]
        b_dummy = c.is_equal(ro.asset_code, _const(c, DUMMY_ASSET_CODE))
        masked[0] = c.conditional_select(b_dummy, masked[0], ro.owner.x)
        masked[1] = c.conditional_select(b_dummy, masked[1], ro.owner.y)
        msg.extend(masked)
    for ro in out_ros[1:]:
        vals = [ro.owner.x, ro.owner.y, ro.amount, ro.blind]
        msg.extend(c.mul(b, v) for b, v in zip(bits[:4], vals))
    return msg
