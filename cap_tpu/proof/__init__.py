"""Proof orchestration layer (reference src/proof/mod.rs twin).

SRS management: `universal_setup` (fresh tau, test/CI), `load_srs`/`store_srs`
(persisted .npz), `universal_setup_for_staging` (deterministic, cached on
disk).  The Aztec Ignition CRS is not retrievable in this environment; its
import path is `load_srs` once converted (reference src/proof/mod.rs:74-109).
"""

from cap_tpu.plonk.srs import (  # noqa: F401
    UniversalSrs,
    load_srs,
    store_srs,
    universal_setup,
    universal_setup_for_staging,
)


def compute_universal_param_size(note_type: str, n_inputs: int, n_outputs: int, tree_depth: int) -> int:
    """Required SRS degree for a note shape (reference utils/mod.rs:89-113):
    builds the circuit for preprocessing and returns eval_domain_size + 2."""
    if note_type == "mint":
        from cap_tpu.proof.mint import MintWitness, MintPublicInput
        from cap_tpu.circuits.mint import build_mint_circuit

        wit, pub = _dummy_mint(tree_depth)
        circuit = build_mint_circuit(wit, pub, tree_depth)
    elif note_type == "transfer":
        from cap_tpu.proof.transfer import dummy_transfer_circuit

        circuit = dummy_transfer_circuit(n_inputs, n_outputs, tree_depth)
    elif note_type == "freeze":
        from cap_tpu.proof.freeze import dummy_freeze_circuit

        circuit = dummy_freeze_circuit(n_inputs, tree_depth)
    else:
        raise ValueError(f"unknown note type {note_type}")
    return circuit.eval_domain_size() + 2


def _dummy_mint(tree_depth: int):
    from cap_tpu.proof.mint import MintWitness, MintPublicInput

    wit = MintWitness.dummy(tree_depth)
    pub = MintPublicInput.from_witness(wit, fee=0)
    return wit, pub
