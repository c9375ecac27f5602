"""Hybrid ElGamal encryption over Baby Jubjub with a Rescue key-stream.

Mirrors `jf_primitives::elgamal` (SURVEY.md §2.2; reference usage:
viewing memos src/structs.rs:1268-1415, viewer keys src/keys.rs:338-451).

Scheme (message = list of Fr scalars, length public):
  keypair: sk in [1, l), pk = sk*G
  encrypt(pk, r, msg): ephemeral = r*G, shared = r*pk
      stream state S = Perm([shared.x, shared.y, 0, 0]);
      key-stream = squeeze rate-3 blocks (permute between blocks)
      ct_i = msg_i + stream_i
  ciphertext = (ephemeral, [ct_i])
  decrypt(sk, ct): shared = sk*ephemeral, same stream, msg_i = ct_i - stream_i

The circuit gadget (cap_tpu.circuits) re-computes exactly this function, so
any change here must be mirrored there.
"""

from __future__ import annotations

from dataclasses import dataclass

from cap_tpu.crypto.jubjub import GENERATOR, TEPoint, rand_scalar
from cap_tpu.crypto.rescue import RATE, RescuePermutation
from cap_tpu.fields.host import FR

_perm = RescuePermutation(FR)


@dataclass(frozen=True)
class ElGamalCiphertext:
    ephemeral: TEPoint
    symm_ctxts: tuple  # tuple of Fr ints

    def to_scalars(self) -> list[int]:
        """Public-input encoding (reference src/proof/transfer.rs:456)."""
        return [self.ephemeral.x, self.ephemeral.y, *self.symm_ctxts]

    @staticmethod
    def from_scalars(scalars) -> "ElGamalCiphertext":
        assert len(scalars) >= 2
        return ElGamalCiphertext(TEPoint(scalars[0], scalars[1]), tuple(scalars[2:]))


def keystream(shared: TEPoint, n: int) -> list[int]:
    state = _perm.permute([shared.x, shared.y, 0, 0])
    out = []
    while len(out) < n:
        out.extend(state[:RATE])
        if len(out) < n:
            state = _perm.permute(state)
    return out[:n]


@dataclass(frozen=True)
class ElGamalEncKey:
    pk: TEPoint

    def deterministic_encrypt(self, randomizer: int, msg: list[int]) -> ElGamalCiphertext:
        eph = GENERATOR.mul_scalar(randomizer)
        shared = self.pk.mul_scalar(randomizer)
        stream = keystream(shared, len(msg))
        cts = tuple((m + s) % FR.p for m, s in zip(msg, stream))
        return ElGamalCiphertext(eph, cts)

    def encrypt(self, rng, msg: list[int]) -> ElGamalCiphertext:
        return self.deterministic_encrypt(rand_scalar(rng), msg)


@dataclass(frozen=True)
class ElGamalKeyPair:
    sk: int
    pk: TEPoint

    @staticmethod
    def generate(rng) -> "ElGamalKeyPair":
        sk = rand_scalar(rng)
        return ElGamalKeyPair(sk, GENERATOR.mul_scalar(sk))

    def enc_key(self) -> ElGamalEncKey:
        return ElGamalEncKey(self.pk)

    def decrypt(self, ct: ElGamalCiphertext) -> list[int]:
        shared = ct.ephemeral.mul_scalar(self.sk)
        stream = keystream(shared, len(ct.symm_ctxts))
        return [(c - s) % FR.p for c, s in zip(ct.symm_ctxts, stream)]
