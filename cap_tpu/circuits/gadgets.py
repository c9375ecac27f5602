"""Transaction gadgets: prove_spend, preserve_balance, hadamard_product.

Reference twin of src/circuit/gadgets.rs (SURVEY.md §2.1 "Circuit: gadgets").
"""

from __future__ import annotations

import enum
from dataclasses import dataclass

from cap_tpu.plonk.circuit import PlonkCircuit
from cap_tpu.plonk.gadgets import ecc
from cap_tpu.plonk.gadgets.merkle import AccMemberWitnessVar, compute_merkle_root
from cap_tpu.circuits.gadgets_helper import (
    derive_nullifier_key_freezer,
    derive_nullifier_key_user,
    derive_user_address,
    nullify,
)
from cap_tpu.circuits.structs import RecordOpeningVar


class Spender(enum.Enum):
    USER = "user"
    FREEZER = "freezer"


@dataclass(frozen=True)
class SpendResult:
    root: int          # recomputed Merkle root var
    nullifier: int
    commitment: int


def prove_spend(
    c: PlonkCircuit,
    ro: RecordOpeningVar,
    acc_wit: AccMemberWitnessVar,
    spend_sk: int,
    spender: Spender,
) -> SpendResult:
    """Authorization + accumulator membership + nullifier derivation
    (reference gadgets.rs:136-171):

      * derive pk = sk*G, enforce it equals the owner address (USER) or the
        record policy's freezer key (FREEZER);
      * recompute the record commitment in-circuit;
      * derive the nullifier key (DH + Rescue with neutral-freezer fallback
        for USER; DH with the owner address for FREEZER) and the nullifier;
      * recompute the Merkle root from (uid, commitment, path).
    """
    sk_bits = c.unpack(spend_sk, 251)
    derived_pk = derive_user_address(c, sk_bits)
    if spender == Spender.USER:
        ecc.enforce_point_equal(c, derived_pk, ro.owner)
        nk = derive_nullifier_key_user(c, spend_sk, sk_bits, ro.policy.freezer_pk)
    else:
        ecc.enforce_point_equal(c, derived_pk, ro.policy.freezer_pk)
        nk = derive_nullifier_key_freezer(c, sk_bits, ro.owner)
    comm = ro.derive_record_commitment(c)
    nul = nullify(c, nk, acc_wit.uid, comm)
    root = compute_merkle_root(c, acc_wit.uid, comm, acc_wit.path)
    return SpendResult(root=root, nullifier=nul, commitment=comm)


def preserve_balance(
    c: PlonkCircuit,
    is_native: int,
    fee: int,
    in_amounts,
    out_amounts,
) -> None:
    """One circuit for both native and non-native transfers
    (reference gadgets.rs:79-134):

      native:      sum(in) == fee + sum(out)
      non-native:  in[0] == out[0] + fee  AND  sum(in[1:]) == sum(out[1:])

    implemented as conditional zero-checks `flag * diff == 0`.
    """
    sum_in = c.sum(list(in_amounts))
    sum_out = c.sum(list(out_amounts))
    d_native = c.lc([sum_in, fee, sum_out], [1, -1, -1])
    c.custom_gate([is_native, d_native, 0, 0, 0], mul0=1)

    not_native = c.logic_neg(is_native)
    d_fee = c.lc([in_amounts[0], out_amounts[0], fee], [1, -1, -1])
    c.custom_gate([not_native, d_fee, 0, 0, 0], mul0=1)
    sum_in_rest = c.sum(list(in_amounts[1:]))
    sum_out_rest = c.sum(list(out_amounts[1:]))
    d_rest = c.sub(sum_in_rest, sum_out_rest)
    c.custom_gate([not_native, d_rest, 0, 0, 0], mul0=1)


def hadamard_product(c: PlonkCircuit, bits, vals) -> list:
    """Elementwise bit*value (reference gadgets.rs:173-189)."""
    assert len(bits) == len(vals)
    return [c.mul(b, v) for b, v in zip(bits, vals)]
