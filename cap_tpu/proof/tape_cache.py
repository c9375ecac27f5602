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


_FINGERPRINT: list = [None]


def _circuit_fingerprint() -> str:
    """Hash of the circuit/gadget sources: a stale on-disk tape from an
    older circuit definition must never be replayed against new code."""
    if _FINGERPRINT[0] is None:
        import glob
        import hashlib
        import os

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha256()
        for pat in ("circuits/*.py", "plonk/gadgets/*.py", "plonk/tape.py",
                    "plonk/circuit.py", "crypto/rescue.py"):
            for f in sorted(glob.glob(os.path.join(root, pat))):
                with open(f, "rb") as fh:
                    h.update(fh.read())
        _FINGERPRINT[0] = h.hexdigest()[:12]
    return _FINGERPRINT[0]


def _disk_path(key) -> str:
    import os

    from cap_tpu.parameters import param_dir

    d = os.path.join(param_dir(), "tapes")
    os.makedirs(d, exist_ok=True)
    name = "_".join(str(k) for k in key) + "_" + _circuit_fingerprint()
    return os.path.join(d, f"{name}.npz")


def _save_disk(key, ct: CompiledTape, pub_vars) -> None:
    """Persist the compiled bytecode so later PROCESSES skip the Python
    circuit build entirely (the C++ replayer consumes the arrays as-is).
    Only meaningful with the native library; the Python-replay fallback
    needs the raw op tape, which is not persisted."""
    import numpy as np

    np.savez_compressed(
        _disk_path(key),
        code=ct.code, consts=ct.consts,
        n_vars=np.int64(ct.n_vars), n_loads=np.int64(ct.n_loads),
        pub_vars=np.asarray(list(pub_vars), dtype=np.int64),
    )


def _load_disk(key):
    import os

    import numpy as np

    from cap_tpu.utils import native

    if not native.HAVE_NATIVE:
        return None
    path = _disk_path(key)
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        ct = CompiledTape.__new__(CompiledTape)
        ct.code = z["code"]
        ct.consts = z["consts"]
        ct.n_vars = int(z["n_vars"])
        ct.n_loads = int(z["n_loads"])
        ct.tape = None  # native-only: no Python fallback from disk
        return ct, [int(v) for v in z["pub_vars"]]


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
        ent = _load_disk(key)
        if ent is not None:
            _cache[key] = ent
    if ent is None:
        circuit = build_circuit()
        ct = CompiledTape(circuit.tape, circuit.num_loads)
        _cache[key] = (ct, list(circuit.pub_vars))
        try:
            _save_disk(key, ct, circuit.pub_vars)
        except Exception:
            pass  # persistence is best-effort
        if circuit.public_input() != pubs:
            raise FailedConstraintSystemError("public input mismatch with circuit")
        return circuit.witness_values

    ct, pub_vars = ent
    inputs = [v % FR.p for v in extract_inputs()]
    limbs = ct.replay_limbs(inputs)
    if limbs is None and ct.tape is None:
        # disk-loaded tape but native replay gone: rebuild the circuit
        _cache.pop(key, None)
        circuit = build_circuit()
        _cache[key] = (CompiledTape(circuit.tape, circuit.num_loads),
                       list(circuit.pub_vars))
        if circuit.public_input() != pubs:
            raise FailedConstraintSystemError("public input mismatch with circuit")
        return circuit.witness_values
    if limbs is None:  # no native library — Python replay
        w = py_replay(ct.tape, inputs)
        if [w[i] for i in pub_vars] != pubs:
            raise FailedConstraintSystemError("public input mismatch with circuit")
        return w
    got = [int.from_bytes(limbs[i].tobytes(), "little") for i in pub_vars]
    if got != pubs:
        raise FailedConstraintSystemError("public input mismatch with circuit")
    return limbs.view("<u2").reshape(ct.n_vars, 16)
