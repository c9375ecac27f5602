"""Keccak-256 (the pre-NIST padding variant used by Ethereum).

Used for asset-code derivation (reference src/structs.rs:279-296) and for the
Solidity-compatible Fiat–Shamir transcript (SURVEY.md §2.2 "SolidityTranscript").
Python stdlib only ships NIST SHA-3 (different padding), so the permutation is
implemented here.  A C++ fast path can be layered underneath transparently.
"""

from __future__ import annotations

_ROUND_CONSTANTS = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
    0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
    0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
    0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
    0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

# rotation offsets r[x][y]
_ROTATIONS = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]

_MASK = (1 << 64) - 1


def _rotl(v: int, n: int) -> int:
    n %= 64
    return ((v << n) | (v >> (64 - n))) & _MASK


def keccak_f1600(state: list[int]) -> list[int]:
    """Keccak-f[1600] permutation on 25 64-bit lanes (x + 5*y indexing)."""
    a = state
    for rc in _ROUND_CONSTANTS:
        # theta
        c = [a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20] for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rotl(c[(x + 1) % 5], 1) for x in range(5)]
        a = [a[i] ^ d[i % 5] for i in range(25)]
        # rho + pi
        b = [0] * 25
        for x in range(5):
            for y in range(5):
                b[y + 5 * ((2 * x + 3 * y) % 5)] = _rotl(a[x + 5 * y], _ROTATIONS[x][y])
        # chi  (flat index i = x + 5*y matches the nested comprehension order)
        a = [
            (b[x + 5 * y] ^ ((~b[(x + 1) % 5 + 5 * y]) & b[(x + 2) % 5 + 5 * y])) & _MASK
            for y in range(5)
            for x in range(5)
        ]
        # iota
        a[0] ^= rc
    return a


def keccak256(data: bytes) -> bytes:
    """Keccak-256 digest (rate 1088 bits / 136 bytes, pad 0x01..0x80).

    Uses the C++ whole-digest fast path when the native library is present
    (one ctypes call per digest); pure Python otherwise.
    """
    try:
        from cap_tpu.utils import native

        fast = native.keccak256(data)
        if fast is not None:
            return fast
    except Exception:
        # partially-initialized native module during import cycles, or no lib
        pass
    rate = 136
    state = [0] * 25
    # pad
    padded = bytearray(data)
    pad_len = rate - (len(padded) % rate)
    padded += b"\x01" + b"\x00" * (pad_len - 2) + b"\x80" if pad_len >= 2 else b"\x81"
    # absorb
    for off in range(0, len(padded), rate):
        block = padded[off : off + rate]
        for i in range(rate // 8):
            state[i] ^= int.from_bytes(block[8 * i : 8 * i + 8], "little")
        state = keccak_f1600(state)
    # squeeze 32 bytes
    out = b"".join(state[i].to_bytes(8, "little") for i in range(4))
    return out
