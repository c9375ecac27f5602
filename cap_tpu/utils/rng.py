"""Deterministic, seedable randomness for the whole framework.

The reference threads `ark_std::rand::RngCore` everywhere and tests use
`ark_std::test_rng()` (SURVEY.md §4).  `CapRng` plays both roles: seeded for
reproducible tests/fixtures, seeded from `os.urandom` for real use.

Implementation: SHAKE-256 in counter mode — not ChaCha20, but a CSPRNG with the
same interface guarantees; the framework never depends on the generator's
internals, only on determinism-under-seed.
"""

from __future__ import annotations

import hashlib
import os


class CapRng:
    """Counter-mode SHAKE-256 DRBG."""

    def __init__(self, seed: bytes | int | None = None):
        if seed is None:
            seed = os.urandom(32)
        elif isinstance(seed, int):
            seed = seed.to_bytes(32, "little", signed=False)
        self._seed = bytes(seed)
        self._counter = 0
        self._buf = b""

    def randbytes(self, n: int) -> bytes:
        while len(self._buf) < n:
            h = hashlib.shake_256()
            h.update(self._seed)
            h.update(self._counter.to_bytes(8, "little"))
            self._counter += 1
            self._buf += h.digest(1024)
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def randrange(self, n: int) -> int:
        """Uniform integer in [0, n) via rejection sampling."""
        assert n > 0
        nbytes = (n.bit_length() + 7) // 8 + 8  # 64 bits of slack -> negligible bias
        return int.from_bytes(self.randbytes(nbytes), "little") % n

    def u64(self) -> int:
        return int.from_bytes(self.randbytes(8), "little")

    def field(self, field) -> int:
        """Uniform element of a PrimeField."""
        return self.randrange(field.p)

    def fork(self, label: bytes) -> "CapRng":
        """Independent child stream (used by parallel fixture builders)."""
        h = hashlib.shake_256()
        h.update(self._seed)
        h.update(b"fork")
        h.update(label)
        return CapRng(h.digest(32))


def test_rng() -> CapRng:
    """Deterministic RNG for tests — mirrors `ark_std::test_rng()` usage."""
    return CapRng(b"cap-tpu deterministic test rng seed.")


test_rng.__test__ = False  # not a pytest test despite the name
