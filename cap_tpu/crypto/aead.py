"""Authenticated hybrid encryption for receiver memos (off-circuit).

Mirrors `jf_primitives::aead` (SURVEY.md §2.2; reference usage: receiver
memos src/structs.rs:1597-1653, user pubkeys src/keys.rs:100-131).  The
reference uses a Curve25519-family construction; since this is entirely
circuit-independent, we use X25519 ECDH + HKDF-SHA256 + ChaCha20-Poly1305
from the `cryptography` package — a standard authenticated hybrid scheme
with the same API shape (labels become associated data).
"""

from __future__ import annotations

from dataclasses import dataclass

from cryptography.hazmat.primitives.asymmetric.x25519 import (
    X25519PrivateKey,
    X25519PublicKey,
)
from cryptography.hazmat.primitives.ciphers.aead import ChaCha20Poly1305
from cryptography.hazmat.primitives.kdf.hkdf import HKDF
from cryptography.hazmat.primitives import hashes


def _derive_key(shared: bytes, eph_pub: bytes, recv_pub: bytes) -> bytes:
    hk = HKDF(
        algorithm=hashes.SHA256(),
        length=32,
        salt=b"cap-tpu/aead-v1",
        info=eph_pub + recv_pub,
    )
    return hk.derive(shared)


@dataclass(frozen=True)
class AeadCiphertext:
    eph_pub: bytes   # 32-byte ephemeral X25519 public key
    nonce: bytes     # 12 bytes
    ct: bytes        # ciphertext || 16-byte tag

    def to_bytes(self) -> bytes:
        return self.eph_pub + self.nonce + len(self.ct).to_bytes(8, "little") + self.ct

    @staticmethod
    def from_bytes(data: bytes) -> "AeadCiphertext":
        eph, nonce = data[:32], data[32:44]
        n = int.from_bytes(data[44:52], "little")
        ct = data[52 : 52 + n]
        if len(ct) != n:
            raise ValueError("truncated AEAD ciphertext")
        return AeadCiphertext(eph, nonce, ct)


@dataclass(frozen=True)
class AeadEncKey:
    pub: bytes  # 32-byte X25519 public key

    def encrypt(self, rng, msg: bytes, label: bytes = b"") -> AeadCiphertext:
        eph_sk = X25519PrivateKey.from_private_bytes(rng.randbytes(32))
        eph_pub = eph_sk.public_key().public_bytes_raw()
        shared = eph_sk.exchange(X25519PublicKey.from_public_bytes(self.pub))
        key = _derive_key(shared, eph_pub, self.pub)
        nonce = rng.randbytes(12)
        ct = ChaCha20Poly1305(key).encrypt(nonce, msg, label)
        return AeadCiphertext(eph_pub, nonce, ct)

    def to_bytes(self) -> bytes:
        return self.pub


@dataclass(frozen=True)
class AeadKeyPair:
    sk_bytes: bytes
    pub: bytes

    @staticmethod
    def generate(rng) -> "AeadKeyPair":
        sk = X25519PrivateKey.from_private_bytes(rng.randbytes(32))
        return AeadKeyPair(
            sk.private_bytes_raw(), sk.public_key().public_bytes_raw()
        )

    def enc_key(self) -> AeadEncKey:
        return AeadEncKey(self.pub)

    def decrypt(self, ctxt: AeadCiphertext, label: bytes = b"") -> bytes:
        sk = X25519PrivateKey.from_private_bytes(self.sk_bytes)
        shared = sk.exchange(X25519PublicKey.from_public_bytes(ctxt.eph_pub))
        key = _derive_key(shared, ctxt.eph_pub, self.pub)
        return ChaCha20Poly1305(key).decrypt(ctxt.nonce, ctxt.ct, label)
