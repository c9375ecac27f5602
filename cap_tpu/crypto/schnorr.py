"""Rescue-hash Schnorr signatures over Baby Jubjub.

Mirrors `jf_primitives::signatures::schnorr` (SURVEY.md §2.2; reference
src/keys.rs:171-241, credential signing src/structs.rs:1179-1233).

Scheme (message = list of Fr scalars):
  sk in [1, l), vk = sk * G
  sign:  r <- rand, R = r*G,
         c = RescueSponge(CS_ID, R.x, R.y, vk.x, vk.y, msg...)   (an Fr element)
         s = r + c*sk mod l           (c used as an integer, reduced mod l)
  sig = (R, s);  verify: s*G == R + c*vk
The challenge c is the *unreduced* 254-bit Fr integer when used as the scalar
for vk — the in-circuit verifier gadget unpacks all Fr bits, so host and
circuit agree without a mod-l reduction in-circuit.
"""

from __future__ import annotations

from dataclasses import dataclass

from cap_tpu.crypto.jubjub import GENERATOR, SUBGROUP_ORDER, TEPoint, rand_scalar
from cap_tpu.crypto.rescue import RescuePermutation
from cap_tpu.fields.host import FR

#: domain separator scalar mixed into the challenge hash
CS_ID_SCHNORR = int.from_bytes(b"SCHNORR_CS_ID_V1", "little") % FR.p

_perm = RescuePermutation(FR)


@dataclass(frozen=True)
class SchnorrSignature:
    sig_r: TEPoint  # commitment point R
    s: int          # response scalar in [0, l)

    def to_scalars(self) -> list[int]:
        return [self.sig_r.x, self.sig_r.y, self.s]


def challenge(vk: TEPoint, sig_r: TEPoint, msg: list[int]) -> int:
    """Fiat–Shamir challenge as an Fr element (also computed in-circuit)."""
    inputs = [CS_ID_SCHNORR, sig_r.x, sig_r.y, vk.x, vk.y] + [m % FR.p for m in msg]
    inputs += [0] * ((-len(inputs)) % 3)
    return _perm.sponge_no_padding(inputs, 1)[0]


@dataclass(frozen=True)
class SchnorrKeyPair:
    sk: int
    vk: TEPoint

    @staticmethod
    def generate(rng) -> "SchnorrKeyPair":
        sk = rand_scalar(rng)
        return SchnorrKeyPair(sk, GENERATOR.mul_scalar(sk))

    @staticmethod
    def from_sk(sk: int) -> "SchnorrKeyPair":
        return SchnorrKeyPair(sk, GENERATOR.mul_scalar(sk))

    def sign(self, msg: list[int], rng) -> SchnorrSignature:
        r = rand_scalar(rng)
        sig_r = GENERATOR.mul_scalar(r)
        c = challenge(self.vk, sig_r, msg)
        s = (r + c * self.sk) % SUBGROUP_ORDER
        return SchnorrSignature(sig_r, s)


def verify(vk: TEPoint, msg: list[int], sig: SchnorrSignature) -> bool:
    if not (sig.sig_r.on_curve() and vk.on_curve()):
        return False
    if not (0 <= sig.s < SUBGROUP_ORDER):
        return False
    c = challenge(vk, sig.sig_r, msg)
    lhs = GENERATOR.mul_scalar(sig.s)
    rhs = sig.sig_r.add(vk.mul_scalar(c))
    return lhs == rhs
