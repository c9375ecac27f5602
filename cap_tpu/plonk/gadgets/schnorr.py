"""In-circuit Schnorr signature verification (credential checks).

Twin of `SignatureGadget::check_signature_validity` (SURVEY.md §2.2;
reference usage: src/circuit/structs.rs:424-429 credential verification).
MUST mirror cap_tpu.crypto.schnorr (spec §4.1.2 Algorithm 1): the
challenge is the PADDED Rescue sponge over [vk.x, vk.y, R.x, R.y, msg...],
and the verification equation is s*G == R + c*vk with the FULL (unreduced)
Fr challenge as the vk scalar — both sides use it as an integer, so host
and circuit agree.
"""

from __future__ import annotations

from dataclasses import dataclass

from cap_tpu.crypto.jubjub import GENERATOR
from cap_tpu.crypto.schnorr import SchnorrSignature
from cap_tpu.plonk.circuit import PlonkCircuit
from cap_tpu.plonk.gadgets import ecc
from cap_tpu.plonk.gadgets.rescue import rescue_sponge_no_padding_gadget


@dataclass(frozen=True)
class SignatureVar:
    sig_r: ecc.PointVariable
    s: int  # response scalar var


def create_signature_variable(c: PlonkCircuit, sig: SchnorrSignature) -> SignatureVar:
    return SignatureVar(ecc.create_point_variable(c, sig.sig_r), c.load(sig.s))


def challenge_gadget(c: PlonkCircuit, vk: ecc.PointVariable, sig_r: ecc.PointVariable, msg_vars) -> int:
    """c = H(X, R, m) with the padded sponge (spec §4.1.2): append the
    padding marker 1 then zero-fill to a rate multiple."""
    inputs = [vk.x, vk.y, sig_r.x, sig_r.y] + list(msg_vars) + [c.one]
    inputs += [c.zero] * ((-len(inputs)) % 3)
    return rescue_sponge_no_padding_gadget(c, inputs, 1)[0]


def check_signature_validity(
    c: PlonkCircuit, vk: ecc.PointVariable, msg_vars, sig: SignatureVar
) -> int:
    """Boolean var: signature valid.  (Callers either enforce_true it or
    fold it into policy logic.)"""
    ch = challenge_gadget(c, vk, sig.sig_r, msg_vars)
    ch_bits = c.unpack_with_wrap(ch, 254)
    lhs = ecc.fixed_base_scalar_mul(c, sig.s, GENERATOR, 251)
    rhs = ecc.ecc_add(c, sig.sig_r, ecc.scalar_mul_bits_variable_base(c, ch_bits, vk))
    return ecc.is_point_equal(c, lhs, rhs)


def enforce_signature_validity(
    c: PlonkCircuit, vk: ecc.PointVariable, msg_vars, sig: SignatureVar
) -> None:
    ch = challenge_gadget(c, vk, sig.sig_r, msg_vars)
    ch_bits = c.unpack_with_wrap(ch, 254)
    lhs = ecc.fixed_base_scalar_mul(c, sig.s, GENERATOR, 251)
    rhs = ecc.ecc_add(c, sig.sig_r, ecc.scalar_mul_bits_variable_base(c, ch_bits, vk))
    ecc.enforce_point_equal(c, lhs, rhs)
