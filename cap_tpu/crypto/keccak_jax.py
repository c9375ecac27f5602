"""Keccak-256 on device (JAX), for the in-program Fiat–Shamir transcript.

The round-by-round prover pays a ~28 ms host sync per transcript round
(commit points must reach the host to be hashed).  Hashing ON DEVICE keeps
the whole 5-round TurboPlonk prove inside one XLA program (see
plonk/transcript_device.py); this module is the Keccak-f[1600] permutation and
the fixed-padding Keccak-256 sponge over **u32 word streams**.

Word streams: the transcript layout is word-aligned by construction
(transcript.py pads labels/data to 4-byte multiples), so messages are
lists of scalar uint32 arrays (little-endian bytes packed b0|b1<<8|...).
Lengths are static per call site — every distinct message length is its
own trace, which jit caches per prove shape.

64-bit lanes are (lo, hi) u32 pairs; lane indexing is x + 5*y, matching
crypto/keccak.py (the host twin — tests assert equality on random data).
Reference role: SolidityTranscript's Keccak (SURVEY.md §2.2).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np
from jax import lax

from cap_tpu.crypto.keccak import _ROTATIONS, _ROUND_CONSTANTS

RATE_WORDS = 34  # 136-byte rate = 34 u32 words


@lru_cache(maxsize=None)
def _rc_arrays_np():
    lo = np.asarray([rc & 0xFFFFFFFF for rc in _ROUND_CONSTANTS], dtype=np.uint32)
    hi = np.asarray([rc >> 32 for rc in _ROUND_CONSTANTS], dtype=np.uint32)
    return lo, hi


def _rc_arrays():
    # jnp conversion must happen per trace (a cached traced constant would
    # leak across jit scopes)
    lo, hi = _rc_arrays_np()
    return jnp.asarray(lo), jnp.asarray(hi)


def _rotl64(lo, hi, n: int):
    n %= 64
    if n == 0:
        return lo, hi
    if n == 32:
        return hi, lo
    if n > 32:
        lo, hi, n = hi, lo, n - 32
    nn = np.uint32(n)
    mn = np.uint32(32 - n)
    return (lo << nn) | (hi >> mn), (hi << nn) | (lo >> mn)


def keccak_f1600_device(lanes):
    """One permutation; lanes = list of 25 (lo, hi) scalar-u32 pairs."""
    rc_lo, rc_hi = _rc_arrays()

    def round_fn(r, a):
        lo = list(a[0])
        hi = list(a[1])
        # theta
        c = [
            (
                lo[x] ^ lo[x + 5] ^ lo[x + 10] ^ lo[x + 15] ^ lo[x + 20],
                hi[x] ^ hi[x + 5] ^ hi[x + 10] ^ hi[x + 15] ^ hi[x + 20],
            )
            for x in range(5)
        ]
        d = []
        for x in range(5):
            rl, rh = _rotl64(c[(x + 1) % 5][0], c[(x + 1) % 5][1], 1)
            d.append((c[(x - 1) % 5][0] ^ rl, c[(x - 1) % 5][1] ^ rh))
        lo = [lo[i] ^ d[i % 5][0] for i in range(25)]
        hi = [hi[i] ^ d[i % 5][1] for i in range(25)]
        # rho + pi
        blo = [None] * 25
        bhi = [None] * 25
        for x in range(5):
            for y in range(5):
                rl, rh = _rotl64(lo[x + 5 * y], hi[x + 5 * y], _ROTATIONS[x][y])
                blo[y + 5 * ((2 * x + 3 * y) % 5)] = rl
                bhi[y + 5 * ((2 * x + 3 * y) % 5)] = rh
        # chi
        lo = [
            blo[x + 5 * y] ^ (~blo[(x + 1) % 5 + 5 * y] & blo[(x + 2) % 5 + 5 * y])
            for y in range(5)
            for x in range(5)
        ]
        hi = [
            bhi[x + 5 * y] ^ (~bhi[(x + 1) % 5 + 5 * y] & bhi[(x + 2) % 5 + 5 * y])
            for y in range(5)
            for x in range(5)
        ]
        # iota
        lo[0] = lo[0] ^ rc_lo[r]
        hi[0] = hi[0] ^ rc_hi[r]
        return tuple(lo), tuple(hi)

    lo0 = tuple(l for l, _ in lanes)
    hi0 = tuple(h for _, h in lanes)
    lo, hi = lax.fori_loop(0, 24, round_fn, (lo0, hi0))
    return [(lo[i], hi[i]) for i in range(25)]


def keccak256_words(words):
    """Keccak-256 over a word-aligned message: list of scalar u32 arrays
    (little-endian packed bytes).  Returns 8 scalar u32 words (32 bytes).

    Padding (0x01 .. 0x80) is applied at word granularity — exact because
    the message is a whole number of words."""
    z = jnp.uint32(0)
    msg = list(words)
    # pad to a whole block
    nw = len(msg)
    rem = nw % RATE_WORDS
    padw = RATE_WORDS - rem
    pad = [z] * padw
    pad[0] = pad[0] | jnp.uint32(0x01)
    pad[-1] = pad[-1] | jnp.uint32(0x80000000)
    if padw == 1:
        pad = [jnp.uint32(0x80000001)]
    msg = msg + pad

    lanes = [(z, z)] * 25
    for off in range(0, len(msg), RATE_WORDS):
        block = msg[off : off + RATE_WORDS]
        new = []
        for i in range(25):
            lo, hi = lanes[i]
            if 2 * i < RATE_WORDS:
                lo = lo ^ block[2 * i]
            if 2 * i + 1 < RATE_WORDS:
                hi = hi ^ block[2 * i + 1]
            new.append((lo, hi))
        lanes = keccak_f1600_device(new)
    out = []
    for i in range(4):
        out.append(lanes[i][0])
        out.append(lanes[i][1])
    return out


def bytes_to_words(data: bytes):
    """Host helper: zero-pad bytes to 4-byte multiple, pack LE u32 words."""
    pad = (-len(data)) % 4
    raw = data + b"\x00" * pad
    return [jnp.uint32(w) for w in np.frombuffer(raw, dtype="<u4")]


def words_to_bytes(words) -> bytes:
    """Host helper (after device->host transfer): u32 words -> bytes."""
    return np.asarray([int(w) for w in words], dtype="<u4").tobytes()


def keccak256_bytes_arr(msg_u8, byte_len: int):
    """Keccak-256 over a BYTE stream held as a [L] uint32 array (one byte
    per element, values < 256); `byte_len` = L is static.  Returns 8 scalar
    u32 words.

    Unlike `keccak256_words` (scalar word lists, trace size proportional to
    message length), the absorb loop here is a `fori_loop` over rate
    blocks with ONE traced permutation — the device SolidityTranscript
    re-hashes its whole append-only buffer (a few KB by round 5) on every
    challenge, which would explode the trace in scalar-list form.
    """
    from jax import lax

    assert msg_u8.shape == (byte_len,)
    rate_bytes = RATE_WORDS * 4
    rem = byte_len % rate_bytes
    padlen = rate_bytes - rem
    pad = np.zeros(padlen, np.uint32)
    pad[0] = 0x01
    pad[-1] |= 0x80
    padded = jnp.concatenate([msg_u8, jnp.asarray(pad)])
    b4 = padded.reshape(-1, 4)
    words = (
        b4[:, 0]
        | (b4[:, 1] << np.uint32(8))
        | (b4[:, 2] << np.uint32(16))
        | (b4[:, 3] << np.uint32(24))
    )
    nblocks = words.shape[0] // RATE_WORDS

    def body(i, lanes):
        lo, hi = lanes
        block = lax.dynamic_slice(words, (i * RATE_WORDS,), (RATE_WORDS,))
        pairs = []
        for j in range(25):
            l, h = lo[j], hi[j]
            if 2 * j < RATE_WORDS:
                l = l ^ block[2 * j]
            if 2 * j + 1 < RATE_WORDS:
                h = h ^ block[2 * j + 1]
            pairs.append((l, h))
        out = keccak_f1600_device(pairs)
        return (jnp.stack([p[0] for p in out]), jnp.stack([p[1] for p in out]))

    z25 = jnp.zeros(25, jnp.uint32)
    lo, hi = lax.fori_loop(0, nblocks, body, (z25, z25))
    return [lo[0], hi[0], lo[1], hi[1], lo[2], hi[2], lo[3], hi[3]]


def words8_to_bytes_arr(words):
    """8 scalar u32 words -> [32] uint32 byte array (LE)."""
    w = jnp.stack(words)
    return jnp.stack(
        [(w >> np.uint32(8 * i)) & np.uint32(0xFF) for i in range(4)], axis=1
    ).reshape(-1)
