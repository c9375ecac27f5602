"""Device Keccak + device transcript + fused prover vs their host twins.

The fused prover's whole premise is byte-equality between the in-program
transcript (crypto/keccak_jax.py, plonk/prover_fused.py) and the host
transcript (plonk/transcript.py): same appends -> same challenges ->
byte-identical proofs for the same rng stream.
"""

import os
import random

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cap_tpu.crypto.keccak import keccak256
from cap_tpu.crypto.keccak_jax import bytes_to_words, keccak256_words, words_to_bytes
from cap_tpu.fields.host import FR
from cap_tpu.ops.limbs import limbs_to_int

rng = random.Random(2024)


@pytest.mark.parametrize("nbytes", [0, 4, 32, 132, 136, 140, 272, 400])
def test_keccak256_words_matches_host(nbytes):
    data = bytes(rng.randrange(256) for _ in range(nbytes))
    want = keccak256(data)
    got_words = jax.jit(lambda ws: jnp.stack(keccak256_words(list(ws))))(
        jnp.stack(bytes_to_words(data)) if nbytes else jnp.zeros((0,), jnp.uint32)
    )
    got = words_to_bytes(list(np.asarray(got_words)))
    assert got == want


def test_device_transcript_matches_host():
    from cap_tpu.plonk.prover_fused import DeviceTranscript, _w
    from cap_tpu.plonk.transcript import Transcript

    host = Transcript()
    init = [_w(int(v)) for v in np.frombuffer(host.state, dtype="<u4")]

    # host side: two appends + three challenges
    data1 = bytes(rng.randrange(256) for _ in range(64))
    data2 = bytes(rng.randrange(256) for _ in range(32 * 3))
    host.append_bytes(b"vk", data1)
    host.append_bytes(b"evals", data2)
    c1 = host.challenge(b"beta")
    c2 = host.challenge(b"gamma")
    host.append_bytes(b"w", data1)
    c3 = host.challenge(b"zeta")

    def run():
        dev = DeviceTranscript(init)
        dev.append_words(b"vk", bytes_to_words(data1), len(data1))
        dev.append_words(b"evals", bytes_to_words(data2), len(data2))
        d1 = dev.challenge_mont(b"beta")
        d2 = dev.challenge_mont(b"gamma")
        dev.append_words(b"w", bytes_to_words(data1), len(data1))
        d3 = dev.challenge_mont(b"zeta")
        return d1, d2, d3

    d1, d2, d3 = jax.jit(run)()
    r_inv = pow(FR.mont_r, -1, FR.p)
    for dev_m, host_v in ((d1, c1), (d2, c2), (d3, c3)):
        got = limbs_to_int(np.asarray(dev_m)) * r_inv % FR.p
        assert got == host_v


@pytest.mark.skipif(
    os.environ.get("CAP_TPU_RUN_SLOW") != "1",
    reason="whole-prove XLA program compiles in ~20 min on CPU; the cheap "
    "transcript-twin equality above is the fast-suite guard — run the full "
    "byte-equality with CAP_TPU_RUN_SLOW=1 on the TPU",
)
def test_fused_prove_identical_to_classic():
    """Same rng stream -> the fused single-program prove must produce a
    byte-identical proof to the round-by-round prover, and verify."""
    from cap_tpu.plonk import prover, prover_fused, verifier
    from cap_tpu.plonk import srs as srs_mod
    from cap_tpu.plonk.circuit import PlonkCircuit
    from cap_tpu.utils.rng import test_rng

    c = PlonkCircuit()
    x = c.load(11)
    for i in range(24):
        x5 = c.mul(c.mul(c.mul(x, x), c.mul(x, x)), x)
        x = c.lc_with_constant([x5, x, c.one, c.one], [1, 1, 0, 0], i)
    c.set_variable_public(x)
    fin = c.finalize_for_arithmetization()
    srs = srs_mod.universal_setup(fin.n + 2, test_rng())
    pk, vk = prover.preprocess(srs, c)

    proof_classic = prover.prove(test_rng(), pk, c.witness_values, c.public_input(),
                                 ext_msg=b"bind-me")
    proof_fused = prover_fused.prove_fused(
        test_rng(), pk, c.witness_values, c.public_input(), ext_msg=b"bind-me"
    )
    assert proof_fused.wire_comms == proof_classic.wire_comms
    assert proof_fused.z_comm == proof_classic.z_comm
    assert proof_fused.t_comms == proof_classic.t_comms
    assert proof_fused.wire_evals == proof_classic.wire_evals
    assert proof_fused.sigma_evals == proof_classic.sigma_evals
    assert proof_fused.z_omega_eval == proof_classic.z_omega_eval
    assert proof_fused.w_zeta == proof_classic.w_zeta
    assert proof_fused.w_zeta_omega == proof_classic.w_zeta_omega
    assert verifier.verify(vk, c.public_input(), proof_fused, ext_msg=b"bind-me") in (
        True, None,
    )
