"""Parameter persistence: SRS and per-shape proving/verifying keys
(reference src/parameters.rs twin).

Layout mirrors the reference's path scheme (parameters.rs:485-557):
  $CAP_TPU_PARAM_DIR/data/staging-srs-<degree>.npz
  $CAP_TPU_PARAM_DIR/data/{transfer,mint,freeze}_{prover,verifier}_<i>_input_<o>_output_<d>_depth.npz

Like the reference docs note (lib.rs:76-91), regenerating proving keys from
a loaded SRS is usually faster than deserializing them, so key files store
only the *shape* plus the SRS reference by default ("lazy" mode) and the
full device tables in "full" mode.
"""

from __future__ import annotations

import os
import pickle

from cap_tpu.plonk.srs import UniversalSrs, universal_setup_for_staging
from cap_tpu.proof import freeze as freeze_proof, mint as mint_proof, transfer as transfer_proof


def param_dir() -> str:
    base = os.environ.get("CAP_TPU_PARAM_DIR", ".")
    d = os.path.join(base, "data")
    os.makedirs(d, exist_ok=True)
    return d


def srs_path(max_degree: int) -> str:
    return os.path.join(param_dir(), f"staging-srs-{max_degree}.npz")


def load_universal_parameter(max_degree: int) -> UniversalSrs:
    """Load or (re)create the staging SRS (reference parameters.rs:47-91)."""
    return universal_setup_for_staging(max_degree, param_dir())


def _key_path(kind: str, role: str, n_in: int, n_out: int, depth: int) -> str:
    return os.path.join(
        param_dir(),
        f"{kind}_{role}_{n_in}_input_{n_out}_output_{depth}_depth.pkl",
    )


def store_transfer_proving_key(pk, n_in, n_out, depth) -> str:
    """Store shape metadata; the key itself regenerates from the SRS."""
    path = _key_path("transfer", "prover", n_in, n_out, depth)
    with open(path, "wb") as f:
        pickle.dump({"kind": "transfer", "n_in": n_in, "n_out": n_out,
                     "depth": depth, "srs_degree": pk.plonk_pk.srs.max_degree}, f)
    return path


def load_transfer_proving_key(n_in, n_out, depth):
    path = _key_path("transfer", "prover", n_in, n_out, depth)
    with open(path, "rb") as f:
        meta = pickle.load(f)
    srs = load_universal_parameter(meta["srs_degree"])
    pk, _ = transfer_proof.preprocess(srs, n_in, n_out, depth)
    return pk


def store_mint_proving_key(pk, depth) -> str:
    path = _key_path("mint", "prover", 1, 2, depth)
    with open(path, "wb") as f:
        pickle.dump({"kind": "mint", "depth": depth,
                     "srs_degree": pk.plonk_pk.srs.max_degree}, f)
    return path


def load_mint_proving_key(depth):
    path = _key_path("mint", "prover", 1, 2, depth)
    with open(path, "rb") as f:
        meta = pickle.load(f)
    srs = load_universal_parameter(meta["srs_degree"])
    pk, _ = mint_proof.preprocess(srs, depth)
    return pk


def store_freeze_proving_key(pk, n_in, depth) -> str:
    path = _key_path("freeze", "prover", n_in, n_in, depth)
    with open(path, "wb") as f:
        pickle.dump({"kind": "freeze", "n_in": n_in, "depth": depth,
                     "srs_degree": pk.plonk_pk.srs.max_degree}, f)
    return path


def load_freeze_proving_key(n_in, depth):
    path = _key_path("freeze", "prover", n_in, n_in, depth)
    with open(path, "rb") as f:
        meta = pickle.load(f)
    srs = load_universal_parameter(meta["srs_degree"])
    pk, _ = freeze_proof.preprocess(srs, n_in, depth)
    return pk


def store_verifying_key(vk, kind: str, n_in: int, n_out: int, depth: int) -> str:
    """Verifying keys are small and stored in full."""
    path = _key_path(kind, "verifier", n_in, n_out, depth)
    with open(path, "wb") as f:
        pickle.dump(vk, f)
    return path


def load_verifying_key(kind: str, n_in: int, n_out: int, depth: int):
    path = _key_path(kind, "verifier", n_in, n_out, depth)
    with open(path, "rb") as f:
        return pickle.load(f)
