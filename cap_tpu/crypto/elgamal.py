"""Hybrid ElGamal encryption over Baby Jubjub with a Rescue key-stream.

Mirrors `jf_primitives::elgamal` (SURVEY.md §2.2; reference usage:
viewing memos src/structs.rs:1268-1415, viewer keys src/keys.rs:338-451).

Scheme per the reference's specification PDF (§4.1.6 Algorithm 6, §4.1.7
Algorithm 7; message = list of Fr scalars, length public):
  keypair: sk in [1, l), pk = sk*G
  encrypt(pk, r, msg): ephemeral = r*G, shared U = r*pk
      symmetric key k = RescuePermutation([U.x, U.y, 0, 0])  (full 4-elem
      state); key-stream block i = RescuePRP_k([i, 0, 0, 0]) — the KEYED
      Rescue PRP in counter mode, blocks of the full state width 4;
      ct_i = msg_i + stream_i
  ciphertext = (ephemeral, [ct_i])
  decrypt(sk, ct): shared = sk*ephemeral, same stream, msg_i = ct_i - stream_i

The circuit gadget (cap_tpu.plonk.gadgets.elgamal) re-computes exactly this
function, so any change here must be mirrored there.
"""

from __future__ import annotations

from dataclasses import dataclass

from cap_tpu.crypto.jubjub import GENERATOR, TEPoint, rand_scalar
from cap_tpu.crypto.rescue import RescuePermutation, apply_key_stream
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


def stream_cipher(shared: TEPoint, data, is_add: bool) -> list[int]:
    """Counter-mode Rescue cipher keyed by the permuted DH point (spec
    §4.1.6-4.1.7): k = Perm([x, y, 0, 0]), block i offset by
    RescuePRP_k([i, 0, 0, 0])."""
    key4 = _perm.permute([shared.x, shared.y, 0, 0])
    return apply_key_stream(FR, key4, list(data), is_add)


@dataclass(frozen=True)
class ElGamalEncKey:
    pk: TEPoint

    def deterministic_encrypt(self, randomizer: int, msg: list[int]) -> ElGamalCiphertext:
        eph = GENERATOR.mul_scalar(randomizer)
        shared = self.pk.mul_scalar(randomizer)
        cts = tuple(stream_cipher(shared, msg, True))
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
        return stream_cipher(shared, list(ct.symm_ctxts), False)
