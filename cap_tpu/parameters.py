"""Parameter persistence: SRS and per-shape proving/verifying keys
(reference src/parameters.rs twin).

Layout mirrors the reference's path scheme (parameters.rs:485-557):
  $CAP_TPU_PARAM_DIR/data/staging-srs-<degree>.npz
  $CAP_TPU_PARAM_DIR/data/{transfer,mint,freeze}_{prover,verifier}_<i>_input_<o>_output_<d>_depth.{json,npz}

Two proving-key modes, as the reference documents (lib.rs:76-91):

* **lazy** (default): the key file is a small JSON stub recording the shape
  and SRS degree; loading re-synthesizes the circuit from the loaded SRS.
* **full**: the key file is an .npz holding the complete arithmetization
  (wire_index, selector/sigma evaluation tables) plus the 18 commitments,
  so loading never runs the Python circuit builder or the commit MSMs —
  only the fast jitted iNTT/coset-NTT table rebuild.

No pickle anywhere: JSON stubs, fixed-layout verifying-key bytes
(plonk/structs.py `VerifyingKey.to_bytes`), and typed .npz arrays — a
parameter file is untrusted input to a crypto library.
"""

from __future__ import annotations

import json
import os

import numpy as np

from cap_tpu.fields.host import FR
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


def _key_path(kind: str, role: str, n_in: int, n_out: int, depth: int, ext: str) -> str:
    return os.path.join(
        param_dir(),
        f"{kind}_{role}_{n_in}_input_{n_out}_output_{depth}_depth.{ext}",
    )


# ---------------------------------------------------------------------------
# proving keys
# ---------------------------------------------------------------------------


def _circuit_fingerprint() -> str:
    from cap_tpu.proof.tape_cache import _circuit_fingerprint as fp

    return fp()


def _store_pk(kind: str, plonk_pk, n_in: int, n_out: int, depth: int,
              mode: str) -> str:
    meta = {"kind": kind, "n_in": n_in, "n_out": n_out, "depth": depth,
            "srs_degree": plonk_pk.srs.max_degree, "mode": mode,
            "circuit_fingerprint": _circuit_fingerprint()}
    if mode == "lazy":
        path = _key_path(kind, "prover", n_in, n_out, depth, "json")
        with open(path, "w") as f:
            json.dump(meta, f)
        return path
    if mode != "full":
        raise ValueError(f"unknown proving-key mode {mode!r}")
    from cap_tpu.ops.ntt import ntt

    import jax
    import jax.numpy as jnp

    # evaluation tables recovered from the key's coefficient form (the
    # stored representation matches preprocess_from_arrays' inputs)
    to_evals = jax.jit(jax.vmap(lambda c: ntt(c, plonk_pk.domain)))
    sel_evals = np.asarray(to_evals(plonk_pk.sel_coeffs))
    sigma_evals = np.asarray(plonk_pk.sigma_evals_dev)
    path = _key_path(kind, "prover", n_in, n_out, depth, "npz")
    np.savez_compressed(
        path,
        meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        wire_index=np.asarray(plonk_pk.wire_index, dtype=np.int32),
        sel_evals=sel_evals.astype(np.uint32),
        sigma_evals=sigma_evals.astype(np.uint32),
        vk=np.frombuffer(plonk_pk.vk.to_bytes(), dtype=np.uint8),
    )
    return path


def _load_pk_full(path: str):
    """(plonk_pk, meta) from a full-mode .npz; no circuit synthesis."""
    from cap_tpu.plonk.prover import preprocess_from_arrays
    from cap_tpu.plonk.structs import VerifyingKey

    import jax.numpy as jnp

    with np.load(path) as z:
        meta = json.loads(z["meta"].tobytes().decode())
        stored_fp = meta.get("circuit_fingerprint")
        if stored_fp is not None and stored_fp != _circuit_fingerprint():
            # circuit/gadget/rescue sources changed since this key was
            # stored — its selector/sigma tables describe a stale circuit
            raise ValueError(
                f"stored key {path} was built from different circuit sources "
                f"({stored_fp} != {_circuit_fingerprint()}); regenerate it"
            )
        vk = VerifyingKey.from_bytes(z["vk"].tobytes())
        srs = load_universal_parameter(meta["srs_degree"])
        pk, _ = preprocess_from_arrays(
            srs, vk.n, vk.num_pub, list(vk.wire_ks),
            z["wire_index"],
            jnp.asarray(z["sel_evals"]), jnp.asarray(z["sigma_evals"]),
            comms=(vk.selector_comms, vk.sigma_comms),
        )
    return pk, meta


def _load_pk(kind: str, n_in: int, n_out: int, depth: int):
    """Returns (meta, plonk_pk_or_None): full .npz wins over a lazy stub."""
    npz = _key_path(kind, "prover", n_in, n_out, depth, "npz")
    if os.path.exists(npz):
        pk, meta = _load_pk_full(npz)
        return meta, pk
    path = _key_path(kind, "prover", n_in, n_out, depth, "json")
    with open(path) as f:
        meta = json.load(f)
    return meta, None


def store_transfer_proving_key(pk, n_in, n_out, depth, mode: str = "lazy") -> str:
    return _store_pk("transfer", pk.plonk_pk, n_in, n_out, depth, mode)


def load_transfer_proving_key(n_in, n_out, depth):
    meta, plonk_pk = _load_pk("transfer", n_in, n_out, depth)
    if plonk_pk is not None:
        return transfer_proof.TransferProvingKey(plonk_pk, n_in, n_out, depth)
    srs = load_universal_parameter(meta["srs_degree"])
    pk, _ = transfer_proof.preprocess(srs, n_in, n_out, depth)
    return pk


def store_mint_proving_key(pk, depth, mode: str = "lazy") -> str:
    return _store_pk("mint", pk.plonk_pk, 1, 2, depth, mode)


def load_mint_proving_key(depth):
    meta, plonk_pk = _load_pk("mint", 1, 2, depth)
    if plonk_pk is not None:
        return mint_proof.MintProvingKey(plonk_pk, depth)
    srs = load_universal_parameter(meta["srs_degree"])
    pk, _ = mint_proof.preprocess(srs, depth)
    return pk


def store_freeze_proving_key(pk, n_in, depth, mode: str = "lazy") -> str:
    return _store_pk("freeze", pk.plonk_pk, n_in, n_in, depth, mode)


def load_freeze_proving_key(n_in, depth):
    meta, plonk_pk = _load_pk("freeze", n_in, n_in, depth)
    if plonk_pk is not None:
        return freeze_proof.FreezeProvingKey(plonk_pk, n_in, depth)
    srs = load_universal_parameter(meta["srs_degree"])
    pk, _ = freeze_proof.preprocess(srs, n_in, depth)
    return pk


# ---------------------------------------------------------------------------
# verifying keys
# ---------------------------------------------------------------------------


def store_verifying_key(vk, kind: str, n_in: int, n_out: int, depth: int) -> str:
    """Fixed-layout bytes + JSON shape header (no pickle)."""
    path = _key_path(kind, "verifier", n_in, n_out, depth, "npz")
    meta = {"kind": kind, "n_in": n_in, "n_out": n_out, "depth": depth}
    np.savez_compressed(
        path,
        meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        vk=np.frombuffer(vk.plonk_vk.to_bytes(), dtype=np.uint8),
    )
    return path


def load_verifying_key(kind: str, n_in: int, n_out: int, depth: int):
    from cap_tpu.plonk.structs import VerifyingKey

    path = _key_path(kind, "verifier", n_in, n_out, depth, "npz")
    with np.load(path) as z:
        meta = json.loads(z["meta"].tobytes().decode())
        plonk_vk = VerifyingKey.from_bytes(z["vk"].tobytes())
    if meta["kind"] != kind:
        raise ValueError(f"key file holds a {meta['kind']} key, expected {kind}")
    if kind == "transfer":
        return transfer_proof.TransferVerifyingKey(plonk_vk, n_in, n_out, depth)
    if kind == "mint":
        return mint_proof.MintVerifyingKey(plonk_vk, depth)
    if kind == "freeze":
        return freeze_proof.FreezeVerifyingKey(plonk_vk, n_in, depth)
    raise ValueError(f"unknown kind {kind!r}")
