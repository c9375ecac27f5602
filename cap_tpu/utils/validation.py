"""Host-side fail-fast validation pipeline (reference src/utils/mod.rs twin,
SURVEY.md §2.1 "Validation helpers").  All checks raise TxnApiError subclasses
before any circuit synthesis happens."""

from __future__ import annotations

from cap_tpu.constants import DUMMY_ASSET_CODE
from cap_tpu.crypto.merkle import check_merkle_proof
from cap_tpu.errors import InvalidParameterError
from cap_tpu.structs import FeeInput, UNFROZEN, check_amount


def check_distinct_input_nullifiers(nullifiers) -> None:
    """(utils/mod.rs:300-311)"""
    vals = [n.value for n in nullifiers]
    if len(set(vals)) != len(vals):
        raise InvalidParameterError("duplicate input nullifiers")


def check_fee(fee_input: FeeInput) -> None:
    """Fee input must be native, unfrozen, owned by the signing keypair, and
    present in the accumulator (utils/mod.rs:602-648)."""
    ro = fee_input.ro
    if not ro.asset_def.is_native():
        raise InvalidParameterError("fee input must be the native asset")
    if ro.freeze_flag != UNFROZEN:
        raise InvalidParameterError("fee input is frozen")
    if fee_input.owner_keypair.pub_key() != ro.pub_key:
        raise InvalidParameterError("fee input not owned by signing keypair")
    wit = fee_input.acc_member_witness
    if not check_merkle_proof(
        wit.root, wit.uid, ro.derive_record_commitment(), wit.merkle_path
    ):
        raise InvalidParameterError("fee input merkle proof invalid")


def check_unfrozen(ros, owners=None) -> None:
    """(utils/mod.rs:696-710)"""
    for ro in ros:
        if ro.freeze_flag != UNFROZEN and not ro.is_dummy():
            raise InvalidParameterError("record is frozen")


def check_input_pub_keys(input_ros, keypairs) -> None:
    """Each non-dummy input must be owned by its keypair (utils/mod.rs:398)."""
    for ro, kp in zip(input_ros, keypairs):
        if ro.is_dummy():
            continue
        if kp.pub_key().address != ro.pub_key.address:
            raise InvalidParameterError("input record not owned by its keypair")


def check_dummy_inputs(input_ros) -> None:
    """Dummy records must have zero amount and dummy asset (utils/mod.rs:756-775)."""
    for ro in input_ros:
        if ro.is_dummy() and ro.amount != 0:
            raise InvalidParameterError("dummy input with nonzero amount")
        if ro.asset_def.code.value == DUMMY_ASSET_CODE and not ro.asset_def.policy.is_dummy():
            raise InvalidParameterError("dummy input with non-dummy policy")


def check_and_get_root(witnesses) -> int:
    """All non-dummy inputs must share one accumulator root (utils/mod.rs:477-499).
    witnesses: list of (AccMemberWitness, is_dummy)."""
    roots = {w.root for w, dummy in witnesses if not dummy}
    if len(roots) > 1:
        raise InvalidParameterError("inconsistent merkle roots among inputs")
    if not roots:
        raise InvalidParameterError("no non-dummy inputs")
    return roots.pop()


def derive_fee(input_total: int, output_total: int) -> int:
    """Native-balance difference as the fee (utils/mod.rs:652-693)."""
    fee = input_total - output_total
    if fee < 0:
        raise InvalidParameterError("outputs exceed inputs")
    return check_amount(fee)


def check_asset_amounts_balanced(input_ros, output_ros) -> None:
    """Per-asset-code conservation for non-native assets (utils/mod.rs:714-752)."""
    balance: dict = {}
    for ro in input_ros:
        if not ro.is_dummy():
            balance[ro.asset_def.code.value] = (
                balance.get(ro.asset_def.code.value, 0) + ro.amount
            )
    for ro in output_ros:
        balance[ro.asset_def.code.value] = (
            balance.get(ro.asset_def.code.value, 0) - ro.amount
        )
    for code, v in balance.items():
        if code != 1 and v != 0:  # native (code 1) imbalance is the fee
            raise InvalidParameterError(f"asset {code} amounts unbalanced")
