"""In-circuit hybrid ElGamal encryption (viewing-memo correctness).

Twin of `jf-primitives::elgamal` circuit gadgets (SURVEY.md §2.2; used by
the transfer/mint viewing-memo constraints, reference
src/circuit/transfer.rs:197-285).  MUST mirror cap_tpu.crypto.elgamal.
"""

from __future__ import annotations

from dataclasses import dataclass

from cap_tpu.crypto.elgamal import ElGamalCiphertext
from cap_tpu.crypto.jubjub import GENERATOR
from cap_tpu.plonk.circuit import PlonkCircuit
from cap_tpu.plonk.gadgets import ecc
from cap_tpu.plonk.gadgets.rescue import rescue_permutation_gadget


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
    state = [shared.x, shared.y, c.zero, c.zero]
    state = rescue_permutation_gadget(c, state)
    cts = []
    i = 0
    while len(cts) < len(msg_vars):
        for j in range(3):
            if len(cts) < len(msg_vars):
                cts.append(c.add(msg_vars[len(cts)], state[j]))
        if len(cts) < len(msg_vars):
            state = rescue_permutation_gadget(c, state)
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
