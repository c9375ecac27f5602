"""Rescue-hash Schnorr (DSA-over-Jubjub) signatures.

Mirrors `jf_primitives::signatures::schnorr` (SURVEY.md §2.2; reference
src/keys.rs:171-241, credential signing src/structs.rs:1179-1233), with the
construction pinned by the reference's specification PDF §4.1.2 Algorithm 1:

  KeyGen: x <-$ Z_q, X = x*B (B = Jubjub subgroup generator)
  Sign(m, x):  r = H(alg_desc, m, x)    — DETERMINISTIC nonce (spec: "to
               avoid attacks based on bad implementation of pseudo-random
               generators"; alg_desc = CS_ID domain separator)
               R = r*B
               c = H(X, R, m)           — vk first, then R, then the message
               s = r + c*x mod q
  Verify(m, X, (R, s)): fail if 8*X = identity (low-order check), then
               check R + c*X == s*B

H is the Rescue sponge WITH padding (spec §4.1.2: "The hash function H used
is Rescue Sponge with padding"); points enter the hash as (x, y) pairs.
The challenge c is the *unreduced* 254-bit Fr integer when used as the
scalar for vk — the in-circuit verifier gadget unpacks all Fr bits, so host
and circuit agree without a mod-l reduction in-circuit.
"""

from __future__ import annotations

from dataclasses import dataclass

from cap_tpu.crypto.jubjub import GENERATOR, SUBGROUP_ORDER, TEPoint, rand_scalar
from cap_tpu.crypto.rescue import RescuePermutation
from cap_tpu.fields.host import FR

#: domain separator scalar (the spec's `alg_desc`), mixed into the
#: deterministic nonce derivation
CS_ID_SCHNORR = int.from_bytes(b"SCHNORR_CS_ID_V1", "little") % FR.p

_perm = RescuePermutation(FR)


@dataclass(frozen=True)
class SchnorrSignature:
    sig_r: TEPoint  # commitment point R
    s: int          # response scalar in [0, l)

    def to_scalars(self) -> list[int]:
        return [self.sig_r.x, self.sig_r.y, self.s]


def challenge(vk: TEPoint, sig_r: TEPoint, msg: list[int]) -> int:
    """Fiat–Shamir challenge c = H(X, R, m) (spec §4.1.2 Algorithm 1) as an
    Fr element — padded Rescue sponge, also computed in-circuit."""
    inputs = [vk.x, vk.y, sig_r.x, sig_r.y] + [m % FR.p for m in msg]
    return _perm.sponge_with_padding(inputs, 1)[0]


def _nonce(sk: int, msg: list[int]) -> int:
    """Deterministic r = H(alg_desc, m, sk) (spec §4.1.2), reduced mod l."""
    inputs = [CS_ID_SCHNORR] + [m % FR.p for m in msg] + [sk % FR.p]
    return _perm.sponge_with_padding(inputs, 1)[0] % SUBGROUP_ORDER


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

    def sign(self, msg: list[int], rng=None) -> SchnorrSignature:
        # rng accepted for API compatibility; the nonce is deterministic
        r = _nonce(self.sk, msg)
        sig_r = GENERATOR.mul_scalar(r)
        c = challenge(self.vk, sig_r, msg)
        s = (r + c * self.sk) % SUBGROUP_ORDER
        return SchnorrSignature(sig_r, s)


def verify(vk: TEPoint, msg: list[int], sig: SchnorrSignature) -> bool:
    if not (sig.sig_r.on_curve() and vk.on_curve()):
        return False
    # spec Algorithm 1: "Fail if 8X = 0" — reject low-order public keys
    if vk.mul_scalar(8).is_neutral():
        return False
    if not (0 <= sig.s < SUBGROUP_ORDER):
        return False
    c = challenge(vk, sig.sig_r, msg)
    lhs = GENERATOR.mul_scalar(sig.s)
    rhs = sig.sig_r.add(vk.mul_scalar(c))
    return lhs == rhs
