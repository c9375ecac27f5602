"""Transaction "models" — the three CAP statement families.

Convenience namespace re-exporting the circuit builders and note APIs (the
zk-circuit analogue of a model zoo: each entry is a statement family with a
fixed compiled shape per (n_inputs, n_outputs, tree_depth) configuration).
"""

from cap_tpu.circuits.freeze import build_freeze_circuit  # noqa: F401
from cap_tpu.circuits.mint import build_mint_circuit  # noqa: F401
from cap_tpu.circuits.transfer import build_transfer_circuit  # noqa: F401
from cap_tpu.freeze import FreezeNote  # noqa: F401
from cap_tpu.mint import MintNote  # noqa: F401
from cap_tpu.transfer import TransferNote  # noqa: F401
