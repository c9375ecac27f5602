"""Device SolidityTranscript pieces vs host (async prover building blocks).

The async prover (plonk/prover_async.py) must reproduce the host
SolidityTranscript byte-for-byte: array-keccak over byte streams, the
challenge derivation, and the arkworks-compressed point / LE scalar
serialization.  All pieces run under jit on CPU, so this is a default-
suite guard; whole-proof byte equality vs the sync prover is asserted
on-chip by scripts/probe_async.py.
"""

import random

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cap_tpu.crypto.keccak import keccak256
from cap_tpu.crypto.keccak_jax import keccak256_bytes_arr, words8_to_bytes_arr
from cap_tpu.fields.host import FQ, FR
from cap_tpu.plonk.prover_async import (
    ds_challenge, g1_batch_bytes_dev, scalars_bytes_dev,
)
from cap_tpu.plonk.transcript import SolidityTranscript
from cap_tpu.utils.serde import g1_to_bytes
from cap_tpu.ops.limbs import ints_to_limbs

rnd = random.Random(77)


def _dev_bytes(data: bytes):
    return jnp.asarray(np.frombuffer(data, np.uint8).astype(np.uint32))


@pytest.mark.parametrize("length", [1, 63, 135, 136, 137, 500])
def test_keccak_bytes_arr_matches_host(length):
    data = bytes(rnd.randrange(256) for _ in range(length))
    words = jax.jit(
        lambda b: jnp.stack(keccak256_bytes_arr(b, length))
    )(_dev_bytes(data))
    got = np.asarray(
        jax.jit(lambda b: words8_to_bytes_arr(keccak256_bytes_arr(b, length)))(
            _dev_bytes(data)
        )
    ).astype(np.uint8).tobytes()
    assert got == keccak256(data)


def test_ds_challenge_matches_solidity_transcript():
    t = SolidityTranscript()
    t.append_bytes(b"", bytes(rnd.randrange(256) for _ in range(200)))
    buf = _dev_bytes(t.buf)
    state = _dev_bytes(t.state)

    @jax.jit
    def two(buf, state):
        c1, state = ds_challenge(buf, state)
        c2, state = ds_challenge(buf, state)
        return c1, c2, state

    c1d, c2d, state_d = two(buf, state)
    from cap_tpu.ops.limbs import limbs_to_ints

    want1 = t.challenge(b"x")
    want2 = t.challenge(b"y")
    got1 = limbs_to_ints(np.asarray(c1d)[None], FR)[0]
    got2 = limbs_to_ints(np.asarray(c2d)[None], FR)[0]
    assert (got1, got2) == (want1, want2)
    assert np.asarray(state_d).astype(np.uint8).tobytes() == t.state


def test_g1_and_scalar_bytes_match_serde():
    from cap_tpu.crypto.bn254 import G1_GEN, g1_mul

    pts = [g1_mul(G1_GEN, rnd.randrange(1, FR.p)) for _ in range(4)]
    # device canonical projective (z = 1), plus one infinity (z = 0)
    rows = []
    for x, y in pts:
        rows.append(np.stack(ints_to_limbs([x, y, 1], FQ)))
    rows.append(np.stack(ints_to_limbs([0, 1, 0], FQ)))
    c = jnp.asarray(np.stack(rows))
    got = np.asarray(jax.jit(g1_batch_bytes_dev)(c)).astype(np.uint8).tobytes()
    want = b"".join(g1_to_bytes(p_) for p_ in pts) + g1_to_bytes(None)
    assert got == want

    vals = [rnd.randrange(FR.p) for _ in range(6)]
    vd = jnp.asarray(ints_to_limbs(vals, FR))
    got = np.asarray(jax.jit(scalars_bytes_dev)(vd)).astype(np.uint8).tobytes()
    want = b"".join(FR.to_bytes_le(v) for v in vals)
    assert got == want
