"""Host-side prime-field arithmetic on arbitrary-precision Python ints.

This is the "slow but obviously correct" layer used for key generation, witness
synthesis, serialization and tests.  The hot polynomial/MSM path runs on device
via the limb-vectorized kernels in :mod:`cap_tpu.ops` which are property-tested
against this module.

Reference parity: implements the consumed `ark-ff` surface documented in
SURVEY.md §2.2 (reference: /root/reference/Cargo.toml:15-25, src/config.rs:72-84):
BN254 base field Fq, scalar field Fr, and the embedded (Baby Jubjub) curve's
scalar field.  The reference gets these from arkworks 0.3; here they are
re-implemented from the published curve parameters.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

# ---------------------------------------------------------------------------
# Curve / field moduli (public BN254 + Baby Jubjub parameters)
# ---------------------------------------------------------------------------

#: BN254 base-field modulus (coordinates of G1 live here).
BN254_FQ = 21888242871839275222246405745257275088696311157297823662689037894645226208583
#: BN254 scalar-field modulus == order of G1/G2 == the SNARK circuit field.
BN254_FR = 21888242871839275222246405745257275088548364400416034343698204186575808495617
#: Baby Jubjub prime-subgroup order (embedded curve over Fr; cofactor 8).
BABYJUBJUB_FR = 2736030358979909402780800718157159386076813972158567259200215660948447373041

#: BN parameter x for BN254 (used by the pairing).
BN_X = 4965661367192848881

# Limb layout shared with the device kernels: 16 little-endian limbs of 16 bits
# each (256-bit capacity for the 254-bit moduli).
NLIMBS = 16
LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1
#: Montgomery radix for the device representation.
MONT_R_BITS = NLIMBS * LIMB_BITS  # 256


class PrimeField:
    """A prime field GF(p) with the helper surface the rest of the stack needs.

    Elements are plain Python ints in [0, p).  All methods are stateless; the
    instance only carries derived constants (two-adicity decomposition,
    multiplicative generator, Montgomery constants for device interop).
    """

    def __init__(self, modulus: int, name: str):
        self.p = modulus
        self.name = name
        self.byte_len = (modulus.bit_length() + 7) // 8
        self.bit_len = modulus.bit_length()
        # 2-adicity: p - 1 = 2^s * t with t odd
        t = modulus - 1
        s = 0
        while t % 2 == 0:
            t //= 2
            s += 1
        self.two_adicity = s
        self.t_odd = t
        # Montgomery constants for the 16x16-bit limb device representation.
        self.mont_r = (1 << MONT_R_BITS) % modulus
        self.mont_r2 = (self.mont_r * self.mont_r) % modulus
        self.mont_rinv = pow(self.mont_r, -1, modulus)
        # -p^{-1} mod 2^LIMB_BITS  (the CIOS "n0'" constant)
        self.n0_inv = (-pow(modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
        self._gen = None

    # -- basic arithmetic ---------------------------------------------------
    def add(self, a: int, b: int) -> int:
        c = a + b
        return c - self.p if c >= self.p else c

    def sub(self, a: int, b: int) -> int:
        c = a - b
        return c + self.p if c < 0 else c

    def neg(self, a: int) -> int:
        return (self.p - a) % self.p

    def mul(self, a: int, b: int) -> int:
        return a * b % self.p

    def sq(self, a: int) -> int:
        return a * a % self.p

    def inv(self, a: int) -> int:
        if a % self.p == 0:
            raise ZeroDivisionError(f"inverse of 0 in {self.name}")
        return pow(a, -1, self.p)

    def div(self, a: int, b: int) -> int:
        return a * self.inv(b) % self.p

    def pow(self, a: int, e: int) -> int:
        return pow(a, e, self.p)

    def batch_inv(self, xs: list[int]) -> list[int]:
        """Montgomery batch inversion: one field inversion for len(xs) inputs."""
        n = len(xs)
        if n == 0:
            return []
        prefix = [0] * n
        acc = 1
        for i, x in enumerate(xs):
            if x == 0:
                raise ZeroDivisionError("batch_inv with zero element")
            prefix[i] = acc
            acc = acc * x % self.p
        acc = self.inv(acc)
        out = [0] * n
        for i in range(n - 1, -1, -1):
            out[i] = acc * prefix[i] % self.p
            acc = acc * xs[i] % self.p
        return out

    # -- square roots -------------------------------------------------------
    def legendre(self, a: int) -> int:
        """Returns 1 if QR, -1 if non-residue, 0 if zero."""
        if a % self.p == 0:
            return 0
        r = pow(a, (self.p - 1) // 2, self.p)
        return 1 if r == 1 else -1

    def sqrt(self, a: int) -> int | None:
        """Tonelli–Shanks; returns the "smaller" root or None if non-residue."""
        p = self.p
        a %= p
        if a == 0:
            return 0
        if self.legendre(a) != 1:
            return None
        if p % 4 == 3:
            r = pow(a, (p + 1) // 4, p)
        else:
            # full Tonelli–Shanks
            z = self.generator_of_quadratic_nonresidue()
            m = self.two_adicity
            c = pow(z, self.t_odd, p)
            t = pow(a, self.t_odd, p)
            r = pow(a, (self.t_odd + 1) // 2, p)
            while t != 1:
                # find least i with t^(2^i) == 1
                i = 0
                tt = t
                while tt != 1:
                    tt = tt * tt % p
                    i += 1
                b = pow(c, 1 << (m - i - 1), p)
                m = i
                c = b * b % p
                t = t * c % p
                r = r * b % p
        return min(r, p - r)

    def generator_of_quadratic_nonresidue(self) -> int:
        g = 2
        while self.legendre(g) != -1:
            g += 1
        return g

    # -- roots of unity (for NTT domains) ----------------------------------
    def multiplicative_generator(self) -> int:
        """Smallest generator of the full multiplicative group.

        Verified against the known factorization of p-1 lazily: we only need
        that g^((p-1)/2^s) has exact order 2^s for NTT purposes, plus g is a
        quadratic non-residue.  For the NTT we require correct order of the
        derived 2^k-th roots, which `root_of_unity` checks explicitly.
        """
        if self._gen is None:
            # For BN254 Fr the canonical generator is 5 (arkworks uses 5); find
            # the smallest g that is a non-residue and whose 2^s component has
            # full order — sufficient for radix-2 domains.
            g = 2
            while True:
                if self.legendre(g) == -1:
                    w = pow(g, self.t_odd, self.p)
                    # order of w must be exactly 2^two_adicity
                    if pow(w, 1 << (self.two_adicity - 1), self.p) != 1:
                        self._gen = g
                        break
                g += 1
        return self._gen

    def root_of_unity(self, order: int) -> int:
        """Primitive `order`-th root of unity (order must be a power of two)."""
        assert order & (order - 1) == 0, "order must be a power of two"
        k = order.bit_length() - 1
        assert k <= self.two_adicity, f"no 2^{k} roots of unity in {self.name}"
        g = self.multiplicative_generator()
        w = pow(g, self.t_odd << (self.two_adicity - k), self.p)
        assert pow(w, order, self.p) == 1
        if order > 1:
            assert pow(w, order // 2, self.p) != 1
        return w

    # -- encodings ----------------------------------------------------------
    def from_le_bytes_mod_order(self, b: bytes) -> int:
        return int.from_bytes(b, "little") % self.p

    def to_bytes_le(self, a: int) -> bytes:
        return int(a % self.p).to_bytes(self.byte_len, "little")

    def from_bytes_le(self, b: bytes) -> int:
        v = int.from_bytes(b, "little")
        if v >= self.p:
            raise ValueError(f"field element out of range for {self.name}")
        return v

    # -- randomness ---------------------------------------------------------
    def rand(self, rng) -> int:
        """Uniform field element from a CapRng-like source (has randrange)."""
        return rng.randrange(self.p)

    # -- Montgomery / limb interop with device kernels ----------------------
    def to_mont(self, a: int) -> int:
        return a * self.mont_r % self.p

    def from_mont(self, a: int) -> int:
        return a * self.mont_rinv % self.p

    def to_limbs(self, a: int) -> list[int]:
        """16 little-endian 16-bit limbs of `a` (not Montgomery-converted)."""
        return [(a >> (LIMB_BITS * i)) & LIMB_MASK for i in range(NLIMBS)]

    def from_limbs(self, limbs) -> int:
        acc = 0
        for i, l in enumerate(limbs):
            acc |= int(l) << (LIMB_BITS * i)
        return acc % self.p

    def __repr__(self):
        return f"PrimeField({self.name})"


# Singletons used across the framework.
FQ = PrimeField(BN254_FQ, "bn254::Fq")
FR = PrimeField(BN254_FR, "bn254::Fr")
FR_EMB = PrimeField(BABYJUBJUB_FR, "jubjub::Fr")

# BLS12-377 fields (reference config.rs:63-84 bls12_377 feature; SRS
# degrees double on this curve, src/utils/mod.rs:144-192).  Fr is 253 bits —
# fits the 16x16-bit limb layout, so the whole field/NTT/MXU stack is
# generic over it (tests/test_multicurve.py); proofs over this curve run
# through the curve-generic host pipeline (plonk/prover_host.py) with the
# full 377-bit base-field algebra in crypto/bls12_377.py.  The embedded
# (ed_on_bls12_377) scalar field backs the CapConfig binding.
BLS12_377_FR = 0x12AB655E9A2CA55660B44D1E5C37B00159AA76FED00000010A11800000000001
FR_BLS12_377 = PrimeField(BLS12_377_FR, "bls12_377::Fr")
# derived in crypto/bls12_377.py from x = 0x8508c00000000001: q = ((x-1)^2 r)/3 + x
BLS12_377_FQ = 258664426012969094010652733694893533536393512754914660539884262666720468348340822774968888139573360124440321458177
FQ_BLS12_377 = PrimeField(BLS12_377_FQ, "bls12_377::Fq")
# ed_on_bls12_377 subgroup order (cofactor 4; verified against the Hasse
# bound + random-point annihilation in tests/test_multicurve.py)
ED_ON_BLS12_377_FR = 2111115437357092606062206234695386632838870926408408195193685246394721360383
FR_EMB_BLS12_377 = PrimeField(ED_ON_BLS12_377_FR, "ed_on_bls12_377::Fr")

# BLS12-381 fields (reference config.rs:25-84 bls12_381 feature).  Fr is
# 255 bits with 2-adicity 32; the curve algebra is derived from
# x = -0xd201000000010000 in crypto/bls12_381.py via the generic BLS12
# factory.  The embedded curve is Jubjub (ed_on_bls12_381, cofactor 8).
BLS12_381_FR = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001
FR_BLS12_381 = PrimeField(BLS12_381_FR, "bls12_381::Fr")
BLS12_381_FQ = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB
FQ_BLS12_381 = PrimeField(BLS12_381_FQ, "bls12_381::Fq")
# Jubjub subgroup order (cofactor 8; Hasse + order assertions at import in
# crypto/bls12_381.py)
ED_ON_BLS12_381_FR = 0x0E7DB4EA6533AFA906673B0101343B00A6682093CCC81082D0970E5ED6F72CB7
FR_EMB_BLS12_381 = PrimeField(ED_ON_BLS12_381_FR, "ed_on_bls12_381::Fr")


def fr_to_fq_emb(a: int) -> int:
    """Embed an embedded-curve scalar into the circuit field Fr.

    Mirrors `jf_utils::fr_to_fq` (SURVEY.md §2.2, reference src/keys.rs:601):
    the Baby Jubjub scalar field is strictly smaller than BN254 Fr, so the
    integer value embeds without reduction.
    """
    assert 0 <= a < BABYJUBJUB_FR
    return a


@dataclass(frozen=True)
class FieldVector:
    """Tiny convenience wrapper for a list of field elements (used in serde)."""

    field: PrimeField
    values: tuple

    def to_bytes(self) -> bytes:
        return b"".join(self.field.to_bytes_le(v) for v in self.values)


def hash_to_field(field: PrimeField, dom_sep: bytes, msg: bytes) -> int:
    """Deterministic hash of arbitrary bytes to a field element.

    Mirrors `jf_utils::hash_to_field` usage (reference src/keys.rs:139,
    src/utils/mod.rs:792).  Implementation: SHAKE-256(dom_sep || msg) expanded
    to 48 bytes, reduced mod p — ~2^-126 bias, negligible.
    """
    h = hashlib.shake_256()
    h.update(len(dom_sep).to_bytes(8, "little"))
    h.update(dom_sep)
    h.update(msg)
    return int.from_bytes(h.digest(48), "little") % field.p
