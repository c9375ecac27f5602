"""In-circuit hybrid ElGamal encryption (viewing-memo correctness).

Twin of `jf-primitives::elgamal` circuit gadgets (SURVEY.md §2.2; used by
the transfer/mint viewing-memo constraints, reference
src/circuit/transfer.rs:197-285).  MUST mirror cap_tpu.crypto.elgamal.
"""

from __future__ import annotations

from dataclasses import dataclass

from cap_tpu.crypto.elgamal import ElGamalCiphertext
from cap_tpu.crypto.jubjub import GENERATOR
from cap_tpu.crypto.rescue import STATE_WIDTH
from cap_tpu.plonk.circuit import PlonkCircuit
from cap_tpu.plonk.gadgets import ecc
from cap_tpu.plonk.gadgets.rescue import (
    key_scheduling_gadget,
    prp_with_round_key_vars_gadget,
    rescue_permutation_gadget,
)


@dataclass(frozen=True)
class ElGamalHybridCtxtVars:
    ephemeral: ecc.PointVariable
    symm_ctxts: tuple  # tuple of vars


def create_enc_key_variable(c: PlonkCircuit, pk) -> ecc.PointVariable:
    """pk: host TEPoint (a viewer ElGamal public key)."""
    return ecc.create_point_variable(c, pk)


def create_ciphertext_variable(c: PlonkCircuit, ct: ElGamalCiphertext) -> ElGamalHybridCtxtVars:
    eph = ecc.create_point_variable(c, ct.ephemeral)
    symm = tuple(c.load(v) for v in ct.symm_ctxts)
    return ElGamalHybridCtxtVars(eph, symm)


def elgamal_encrypt(
    c: PlonkCircuit,
    pk_var: ecc.PointVariable,
    randomizer: int,
    msg_vars,
) -> ElGamalHybridCtxtVars:
    """Recompute the hybrid ciphertext in-circuit.

    randomizer: circuit var holding an embedded-curve scalar (251 bits).
    """
    bits = c.unpack(randomizer, 251)
    eph = ecc.scalar_mul_bits_fixed_base(c, bits, GENERATOR)
    shared = ecc.scalar_mul_bits_variable_base(c, bits, pk_var)
    # spec §4.1.6-4.1.7: symmetric key = Perm([x, y, 0, 0]) (full state),
    # key stream block i = RescuePRP_key([i, 0, 0, 0]), blocks of width 4
    key4 = rescue_permutation_gadget(c, [shared.x, shared.y, c.zero, c.zero])
    rk_vars = key_scheduling_gadget(c, key4)
    cts = []
    for off in range(0, len(msg_vars), STATE_WIDTH):
        block = msg_vars[off : off + STATE_WIDTH]
        nonce = off // STATE_WIDTH
        stream = prp_with_round_key_vars_gadget(
            c, [nonce, 0, 0, 0], rk_vars
        )
        cts.extend(c.add(m, s) for m, s in zip(block, stream))
    return ElGamalHybridCtxtVars(eph, tuple(cts))


def check_ciphertext_equal(
    c: PlonkCircuit, a: ElGamalHybridCtxtVars, b: ElGamalHybridCtxtVars
) -> int:
    """Boolean var: all components equal."""
    assert len(a.symm_ctxts) == len(b.symm_ctxts)
    checks = [ecc.is_point_equal(c, a.ephemeral, b.ephemeral)]
    for x, y in zip(a.symm_ctxts, b.symm_ctxts):
        checks.append(c.is_equal(x, y))
    return c.logic_and_all(checks)


def enforce_ciphertext_equal(
    c: PlonkCircuit, a: ElGamalHybridCtxtVars, b: ElGamalHybridCtxtVars
) -> None:
    ecc.enforce_point_equal(c, a.ephemeral, b.ephemeral)
    for x, y in zip(a.symm_ctxts, b.symm_ctxts):
        c.enforce_equal(x, y)


def set_ciphertext_public(c: PlonkCircuit, ct: ElGamalHybridCtxtVars) -> None:
    """Expose a ciphertext as public inputs, in to_scalars() order."""
    c.set_variable_public(ct.ephemeral.x)
    c.set_variable_public(ct.ephemeral.y)
    for v in ct.symm_ctxts:
        c.set_variable_public(v)
