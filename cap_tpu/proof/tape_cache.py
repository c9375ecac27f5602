"""Per-shape witness-tape cache for the prove paths.

The reference re-synthesizes each circuit in compiled Rust on every prove
(src/proof/transfer.rs:159-188) — cheap there, ~0.45 s of interpreted Python
here.  Instead, the first prove of a (family, shape) records the witness
tape (plonk/tape.py) once; later proves extract the leaf inputs and replay
the tape through the native C++ replayer (~10x faster, and emitting the
prover's u16 limb format directly with no Python-int round-trip).
"""

from __future__ import annotations

from cap_tpu.errors import FailedConstraintSystemError
from cap_tpu.fields.host import FR
from cap_tpu.plonk.tape import CompiledTape, replay as py_replay

_cache: dict = {}


def clear() -> None:
    _cache.clear()


def witness_via_tape(key, build_circuit, extract_inputs, pubs):
    """Witness vector for the prover, via tape replay when warm.

    key: hashable (family, shape) tuple.
    build_circuit: zero-arg callable returning the fully-built PlonkCircuit
        (only invoked on the first prove of this shape).
    extract_inputs: zero-arg callable returning the leaf-input list in tape
        load order (cheap; invoked on warm proves).
    pubs: expected public-input scalars (already reduced mod p).

    Returns either a list of ints or a plain-form uint16 limb ndarray
    (n_vars, 16) — both accepted by plonk.prover.prove.
    Raises FailedConstraintSystemError on a public-input mismatch.
    """
    ent = _cache.get(key)
    if ent is None:
        circuit = build_circuit()
        _cache[key] = (CompiledTape(circuit.tape, circuit.num_loads),
                       list(circuit.pub_vars))
        if circuit.public_input() != pubs:
            raise FailedConstraintSystemError("public input mismatch with circuit")
        return circuit.witness_values

    ct, pub_vars = ent
    inputs = [v % FR.p for v in extract_inputs()]
    limbs = ct.replay_limbs(inputs)
    if limbs is None:  # no native library — Python replay
        w = py_replay(ct.tape, inputs)
        if [w[i] for i in pub_vars] != pubs:
            raise FailedConstraintSystemError("public input mismatch with circuit")
        return w
    got = [int.from_bytes(limbs[i].tobytes(), "little") for i in pub_vars]
    if got != pubs:
        raise FailedConstraintSystemError("public input mismatch with circuit")
    return limbs.view("<u2").reshape(ct.n_vars, 16)
