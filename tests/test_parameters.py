"""Parameter persistence (reference src/parameters.rs twin).

Full-mode proving keys and fixed-layout verifying keys must round-trip
through disk with no pickle anywhere, and the loaded proving key must
actually prove (verified against the original verifying key).  Uses the
small pow5-chain circuit so the whole flow runs on CPU.
"""

import json
import os

import pytest

from cap_tpu import parameters
from cap_tpu.fields.host import FR
from cap_tpu.plonk import prover, verifier
from cap_tpu.plonk.structs import VerifyingKey
from cap_tpu.proof.transfer import TransferProvingKey, TransferVerifyingKey
from cap_tpu.utils.rng import test_rng

from tests.test_plonk_e2e import _pow5_chain_circuit


@pytest.fixture(scope="module")
def small_pk():
    rng = test_rng()
    c = _pow5_chain_circuit(777)
    fin = c.finalize_for_arithmetization()
    import tempfile

    tmp = tempfile.mkdtemp(prefix="cap_params_")
    old = os.environ.get("CAP_TPU_PARAM_DIR")
    old_msm = os.environ.get("CAP_MSM")
    os.environ["CAP_MSM"] = "host"
    os.environ["CAP_TPU_PARAM_DIR"] = tmp
    srs = parameters.load_universal_parameter(fin.n + 2)
    pk, vk = prover.preprocess(srs, c)
    yield rng, c, srs, pk, vk, tmp
    if old is None:
        os.environ.pop("CAP_TPU_PARAM_DIR", None)
    else:
        os.environ["CAP_TPU_PARAM_DIR"] = old
    if old_msm is None:
        os.environ.pop("CAP_MSM", None)
    else:
        os.environ["CAP_MSM"] = old_msm


def test_vk_bytes_roundtrip_and_tamper(small_pk):
    _, _, _, pk, vk, _ = small_pk
    blob = vk.to_bytes()
    back = VerifyingKey.from_bytes(blob)
    assert back.digest() == vk.digest()
    assert back.n == vk.n and back.wire_ks == vk.wire_ks
    # corrupt one commitment x-coordinate -> must not parse silently into
    # the same key (either raises or changes the digest)
    bad = bytearray(blob)
    bad[16 + 5 * 32] ^= 1
    try:
        parsed = VerifyingKey.from_bytes(bytes(bad))
        assert parsed.digest() != vk.digest()
    except ValueError:
        pass
    with pytest.raises(ValueError):
        VerifyingKey.from_bytes(blob[:-1])


def test_verifying_key_store_load(small_pk):
    _, _, _, pk, vk, _ = small_pk
    wrapper = TransferVerifyingKey(vk, 2, 2, 5)
    path = parameters.store_verifying_key(wrapper, "transfer", 2, 2, 5)
    assert path.endswith(".npz")
    loaded = parameters.load_verifying_key("transfer", 2, 2, 5)
    assert loaded.plonk_vk.digest() == vk.digest()
    assert (loaded.n_inputs, loaded.n_outputs, loaded.tree_depth) == (2, 2, 5)
    # a transfer key blob copied under a mint filename must be rejected by
    # the kind check inside the file, not trusted by its filename
    import shutil

    shutil.copy(path, parameters._key_path("mint", "verifier", 2, 2, 5, "npz"))
    with pytest.raises(ValueError):
        parameters.load_verifying_key("mint", 2, 2, 5)


def test_proving_key_full_mode_roundtrip(small_pk):
    rng, c, srs, pk, vk, _ = small_pk
    wrapper = TransferProvingKey(pk, 2, 2, 5)
    path = parameters.store_transfer_proving_key(wrapper, 2, 2, 5, mode="full")
    assert path.endswith(".npz")
    loaded = parameters.load_transfer_proving_key(2, 2, 5)
    lpk = loaded.plonk_pk
    assert lpk.vk.digest() == pk.vk.digest()
    import numpy as np

    assert np.array_equal(np.asarray(lpk.sel_coset), np.asarray(pk.sel_coset))
    assert np.array_equal(np.asarray(lpk.wire_index), np.asarray(pk.wire_index))
    # the loaded key proves, and the proof verifies under the ORIGINAL vk
    pubs = c.public_input()
    proof = prover.prove(rng, lpk, c.witness_values, pubs)
    assert verifier.verify(vk, pubs, proof)


def test_proving_key_lazy_stub_is_json(small_pk):
    _, _, _, pk, _, tmp = small_pk
    wrapper = TransferProvingKey(pk, 3, 3, 7)
    path = parameters.store_transfer_proving_key(wrapper, 3, 3, 7, mode="lazy")
    assert path.endswith(".json")
    with open(path) as f:
        meta = json.load(f)
    fp = meta.pop("circuit_fingerprint")
    assert isinstance(fp, str) and len(fp) == 12
    assert meta == {"kind": "transfer", "n_in": 3, "n_out": 3, "depth": 7,
                    "srs_degree": pk.srs.max_degree, "mode": "lazy"}


# ---------------------------------------------------------------------------
# Aztec Ignition CRS import (reference proof/mod.rs:74-109)
# ---------------------------------------------------------------------------


def test_aztec_crs_roundtrip(tmp_path):
    import numpy as np

    from cap_tpu.fields.host import FQ
    from cap_tpu.ops.limbs import limbs_to_ints
    from cap_tpu.plonk import aztec
    from cap_tpu.plonk.srs import universal_setup
    from cap_tpu.utils.rng import test_rng

    srs = universal_setup(16, test_rng())
    xs = limbs_to_ints(np.asarray(srs.g1_x), FQ)
    ys = limbs_to_ints(np.asarray(srs.g1_y), FQ)
    pts = list(zip(xs, ys))
    path = str(tmp_path / "transcript00.dat")
    digest = aztec.write_ignition_format(path, pts, g2_tau=srs.g2_tau)

    srs2 = aztec.load_aztec_crs(path, expected_sha256=digest)
    assert srs2.max_degree == srs.max_degree
    assert limbs_to_ints(np.asarray(srs2.g1_x), FQ) == xs
    assert limbs_to_ints(np.asarray(srs2.g1_y), FQ) == ys
    assert srs2.g2_tau == srs.g2_tau

    # truncation by max_degree
    srs3 = aztec.load_aztec_crs(path, expected_sha256=digest, max_degree=8)
    assert srs3.num_points == 9


def test_aztec_crs_rejects_tampering(tmp_path):
    import numpy as np
    import pytest

    from cap_tpu.errors import DeserializationError
    from cap_tpu.fields.host import FQ
    from cap_tpu.ops.limbs import limbs_to_ints
    from cap_tpu.plonk import aztec
    from cap_tpu.plonk.srs import universal_setup
    from cap_tpu.utils.rng import test_rng

    srs = universal_setup(8, test_rng())
    xs = limbs_to_ints(np.asarray(srs.g1_x), FQ)
    ys = limbs_to_ints(np.asarray(srs.g1_y), FQ)
    pts = list(zip(xs, ys))
    path = str(tmp_path / "t.dat")
    digest = aztec.write_ignition_format(path, pts, g2_tau=srs.g2_tau)

    # wrong pinned digest
    with pytest.raises(DeserializationError):
        aztec.load_aztec_crs(path, expected_sha256="00" * 32)

    # flip a coordinate byte: sha passes only if recomputed, so skip the
    # digest and hit the on-curve check
    blob = bytearray(open(path, "rb").read())
    blob[aztec.HEADER_LEN + 5] ^= 1
    bad = str(tmp_path / "bad.dat")
    open(bad, "wb").write(bytes(blob))
    with pytest.raises(DeserializationError):
        aztec.load_aztec_crs(bad)
