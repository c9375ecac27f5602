"""Transaction gadget helpers (reference src/circuit/gadgets_helper.rs twin).

Host twins: asset-code PRF in cap_tpu.structs, nullifier-key derivation in
cap_tpu.keys — these must stay in lockstep.
"""

from __future__ import annotations

from cap_tpu.crypto.jubjub import GENERATOR
from cap_tpu.plonk.circuit import PlonkCircuit
from cap_tpu.plonk.gadgets import ecc
from cap_tpu.plonk.gadgets.rescue import (
    prf_gadget,
    rescue_sponge_no_padding_gadget,
)


def derive_internal_asset_code(c: PlonkCircuit, seed: int, digest: int) -> int:
    """PRF(seed; [digest]) (gadgets_helper.rs:44-50)."""
    return prf_gadget(c, seed, [digest], 1)[0]


def derive_user_address(c: PlonkCircuit, sk_bits) -> ecc.PointVariable:
    """Fixed-base mul of the user spend key (gadgets_helper.rs:52-59)."""
    return ecc.scalar_mul_bits_fixed_base(c, sk_bits, GENERATOR)


def derive_nullifier_key_user(
    c: PlonkCircuit, sk: int, sk_bits, freezer_pk: ecc.PointVariable
) -> int:
    """User-side nk: DH hash, falling back to the raw sk when the freezer
    key is neutral (gadgets_helper.rs:61-73; host twin keys.py)."""
    dh = ecc.scalar_mul_bits_variable_base(c, sk_bits, freezer_pk)
    hashed = rescue_sponge_no_padding_gadget(c, [dh.x, dh.y, c.zero], 1)[0]
    is_neut = ecc.is_neutral_point(c, freezer_pk)
    return c.conditional_select(is_neut, hashed, sk)


def derive_nullifier_key_freezer(
    c: PlonkCircuit, sk_bits, owner: ecc.PointVariable
) -> int:
    """Freezer-side nk: hash of DH with the record owner's address."""
    dh = ecc.scalar_mul_bits_variable_base(c, sk_bits, owner)
    return rescue_sponge_no_padding_gadget(c, [dh.x, dh.y, c.zero], 1)[0]


def nullify(c: PlonkCircuit, nk: int, uid: int, com: int) -> int:
    """PRF(nk; [uid, com]) (gadgets_helper.rs:75-82)."""
    return prf_gadget(c, nk, [uid, com], 1)[0]
