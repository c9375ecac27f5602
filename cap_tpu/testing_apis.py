"""Test-only accessors (reference src/testing_apis.rs twin).

The reference feature-gates wrappers exposing verifying keys and a public
TransferPublicInput mirror for external testing.  Python has no feature
gates; these helpers exist so downstream test-suites don't reach into
private modules.
"""

from __future__ import annotations

from cap_tpu.proof.transfer import TransferPublicInput, TransferVerifyingKey  # noqa: F401
from cap_tpu.proof.mint import MintPublicInput, MintVerifyingKey  # noqa: F401
from cap_tpu.proof.freeze import FreezePublicInput, FreezeVerifyingKey  # noqa: F401


def transfer_public_input_from_note(note, merkle_root: int, timestamp: int):
    """Reassemble the public input a verifier derives from a TransferNote."""
    return note.check_instance_and_get_public_input(merkle_root, timestamp)


def note_verifying_key_shape(vk) -> tuple:
    """(n_inputs, n_outputs, tree_depth) of any note verifying key."""
    n_in = getattr(vk, "n_inputs", 1)
    n_out = getattr(vk, "n_outputs", getattr(vk, "n_inputs", 2))
    return (n_in, n_out, vk.tree_depth)
