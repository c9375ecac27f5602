"""Device Keccak + device transcript + fused prover vs their host twins.

The fused prover's whole premise is byte-equality between the in-program
transcript (crypto/keccak_jax.py, plonk/transcript_device.py) and the host
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
    from cap_tpu.plonk.transcript_device import DeviceTranscript, _w
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
