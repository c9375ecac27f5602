"""Circuit variables for CAP domain structures.

Twin of reference src/circuit/structs.rs (SURVEY.md §2.1 "Circuit: shared
vars"): RecordOpeningVar + in-circuit commitment, AssetPolicyVar with
dummy/equality predicates, ExpirableCredVar verification, ViewableMemoVar.
Witness recipes MUST mirror cap_tpu.structs exactly.
"""

from __future__ import annotations

from dataclasses import dataclass

from cap_tpu.constants import MAX_TIMESTAMP_LEN, VIEWABLE_DATA_LEN
from cap_tpu.plonk.circuit import PlonkCircuit
from cap_tpu.plonk.gadgets import ecc, elgamal, schnorr as schnorr_g
from cap_tpu.plonk.gadgets.rescue import commitment_gadget
from cap_tpu.structs import AssetPolicy, ExpirableCredential, RecordOpening

ViewableMemoVar = elgamal.ElGamalHybridCtxtVars


# ---------------------------------------------------------------------------
# extract-inputs helpers: the per-prove leaf values consumed by the witness
# tape, in exactly the order the builders' load() calls consume them.  Each
# mirrors the corresponding Var constructor; tests/test_witness_tape.py
# asserts the order against a fresh build for every circuit family.
# ---------------------------------------------------------------------------


def policy_inputs(policy: "AssetPolicy") -> list:
    out = [1 if b else 0 for b in policy.reveal_map.bits]
    out += [policy.viewer_pk.x, policy.viewer_pk.y]
    out += [policy.cred_pk.x, policy.cred_pk.y]
    out += [policy.freezer_pk.x, policy.freezer_pk.y]
    out.append(policy.reveal_threshold)
    return out


def ro_inputs(ro: "RecordOpening") -> list:
    out = [ro.amount, ro.asset_def.code.value]
    out += [ro.pub_key.address.x, ro.pub_key.address.y]
    out += policy_inputs(ro.asset_def.policy)
    out.append(1 if ro.freeze_flag else 0)
    out.append(ro.blind.value)
    return out


def acc_wit_inputs(wit, depth: int) -> list:
    from cap_tpu.crypto.merkle import base3_digits

    digits = base3_digits(wit.uid, depth)
    out = [wit.uid]
    for lvl in range(depth):
        node = wit.merkle_path.nodes[lvl]
        d = digits[lvl]
        out += [d & 1, (d >> 1) & 1, node.sibling1, node.sibling2]
    return out


def cred_inputs(cred: "ExpirableCredential") -> list:
    out = [cred.user_addr.x, cred.user_addr.y]
    out += [a.to_scalar() for a in cred.attrs]
    out.append(cred.expiry)
    out += [cred.cred.sig_r.x, cred.cred.sig_r.y, cred.cred.s]
    out += [cred.creator_pk.x, cred.creator_pk.y]
    return out


def ciphertext_inputs(ct) -> list:
    return [ct.ephemeral.x, ct.ephemeral.y] + list(ct.symm_ctxts)


@dataclass(frozen=True)
class UserAddressVar:
    point: ecc.PointVariable


@dataclass(frozen=True)
class AssetPolicyVar:
    viewer_pk: ecc.PointVariable
    cred_pk: ecc.PointVariable
    freezer_pk: ecc.PointVariable
    reveal_map: int          # scalar var (big-endian fold of the 12 bits)
    reveal_map_bits: tuple   # 12 boolean vars (MSB=bit0 of the map first)
    reveal_threshold: int

    @staticmethod
    def new(c: PlonkCircuit, policy: AssetPolicy) -> "AssetPolicyVar":
        bits = [c.load_bool(b) for b in policy.reveal_map.bits]
        # scalar = big-endian fold
        p = c.f.p
        acc = c.zero
        i = 0
        coeffs_pos = [pow(2, VIEWABLE_DATA_LEN - 1 - j, p) for j in range(VIEWABLE_DATA_LEN)]
        while i < VIEWABLE_DATA_LEN:
            chunk = bits[i : i + 3]
            acc = c.lc([acc] + chunk, [1] + coeffs_pos[i : i + len(chunk)])
            i += 3
        return AssetPolicyVar(
            viewer_pk=ecc.create_point_variable(c, policy.viewer_pk),
            cred_pk=ecc.create_point_variable(c, policy.cred_pk),
            freezer_pk=ecc.create_point_variable(c, policy.freezer_pk),
            reveal_map=acc,
            reveal_map_bits=tuple(bits),
            reveal_threshold=c.load(policy.reveal_threshold),
        )

    def to_scalar_vars(self) -> list:
        return [
            self.viewer_pk.x, self.viewer_pk.y,
            self.cred_pk.x, self.cred_pk.y,
            self.freezer_pk.x, self.freezer_pk.y,
            self.reveal_map, self.reveal_threshold,
        ]

    def is_dummy(self, c: PlonkCircuit) -> int:
        """Boolean var: all keys neutral, map 0, threshold 0."""
        checks = [
            ecc.is_neutral_point(c, self.viewer_pk),
            ecc.is_neutral_point(c, self.cred_pk),
            ecc.is_neutral_point(c, self.freezer_pk),
            c.is_zero(self.reveal_map),
            c.is_zero(self.reveal_threshold),
        ]
        return c.logic_and_all(checks)

    def is_equal(self, c: PlonkCircuit, other: "AssetPolicyVar") -> int:
        checks = [
            c.is_equal(a, b)
            for a, b in zip(self.to_scalar_vars(), other.to_scalar_vars())
        ]
        return c.logic_and_all(checks)

    def enforce_equal(self, c: PlonkCircuit, other: "AssetPolicyVar") -> None:
        for a, b in zip(self.to_scalar_vars(), other.to_scalar_vars()):
            c.enforce_equal(a, b)


@dataclass(frozen=True)
class RecordOpeningVar:
    amount: int
    asset_code: int
    owner: ecc.PointVariable
    policy: AssetPolicyVar
    freeze_flag: int  # boolean var
    blind: int

    @staticmethod
    def new(c: PlonkCircuit, ro: RecordOpening) -> "RecordOpeningVar":
        return RecordOpeningVar(
            amount=c.load(ro.amount),
            asset_code=c.load(ro.asset_def.code.value),
            owner=ecc.create_point_variable(c, ro.pub_key.address),
            policy=AssetPolicyVar.new(c, ro.asset_def.policy),
            freeze_flag=c.load_bool(ro.freeze_flag),
            blind=c.load(ro.blind.value),
        )

    def derive_record_commitment(self, c: PlonkCircuit) -> int:
        """In-circuit twin of RecordOpening.derive_record_commitment.

        The 11th input is 2*reveal_map + freeze_flag, computed with one lc
        gate (reference circuit/structs.rs:108-193)."""
        rf = c.lc([self.policy.reveal_map, self.freeze_flag], [2, 1])
        inputs = [
            self.amount,
            self.asset_code,
            self.owner.x, self.owner.y,
            self.policy.viewer_pk.x, self.policy.viewer_pk.y,
            self.policy.cred_pk.x, self.policy.cred_pk.y,
            self.policy.freezer_pk.x, self.policy.freezer_pk.y,
            rf,
            self.policy.reveal_threshold,
        ]
        return commitment_gadget(c, inputs, self.blind, 12)


@dataclass(frozen=True)
class ExpirableCredVar:
    user_addr: ecc.PointVariable
    attrs: tuple      # ATTRS_LEN scalar vars
    expiry: int
    sig: schnorr_g.SignatureVar
    creator_pk: ecc.PointVariable

    @staticmethod
    def new(c: PlonkCircuit, cred: ExpirableCredential) -> "ExpirableCredVar":
        return ExpirableCredVar(
            user_addr=ecc.create_point_variable(c, cred.user_addr),
            attrs=tuple(c.load(a.to_scalar()) for a in cred.attrs),
            expiry=c.load(cred.expiry),
            sig=schnorr_g.create_signature_variable(c, cred.cred),
            creator_pk=ecc.create_point_variable(c, cred.creator_pk),
        )

    def verify(self, c: PlonkCircuit, valid_until: int) -> None:
        """Enforce: (expiry - valid_until) in [0, 2^MAX_TIMESTAMP_LEN) AND
        signature valid (reference circuit/structs.rs:353-431)."""
        diff = c.sub(self.expiry, valid_until)
        c.enforce_in_range(diff, MAX_TIMESTAMP_LEN)
        msg = [self.expiry, self.user_addr.x, self.user_addr.y] + list(self.attrs)
        schnorr_g.enforce_signature_validity(c, self.creator_pk, msg, self.sig)

    def verify_flag(self, c: PlonkCircuit, valid_until: int) -> int:
        """Boolean variant for OR-gated policies: not-expired AND sig valid.
        One-sided range check — sound inside `valid OR no-cred-policy`."""
        diff = c.sub(self.expiry, valid_until)
        b_range = c.check_in_range_conditional(diff, MAX_TIMESTAMP_LEN)
        msg = [self.expiry, self.user_addr.x, self.user_addr.y] + list(self.attrs)
        b_sig = schnorr_g.check_signature_validity(c, self.creator_pk, msg, self.sig)
        return c.logic_and(b_range, b_sig)
