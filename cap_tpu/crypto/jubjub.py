"""Baby Jubjub — the twisted Edwards curve embedded in BN254's scalar field.

Mirrors the consumed `ark_ed_on_bn254` surface (SURVEY.md §2.2; reference
src/config.rs:81 `EmbeddedCurveParam`).  Parameters are the public EIP-2494
constants: a*x^2 + y^2 = 1 + d*x^2*y^2 over Fr with a = 168700, d = 168696,
prime-subgroup order l (cofactor 8).  All in-circuit ECC gadgets operate on
this curve, so host ops here and gadget twins must agree exactly.

Points are immutable (x, y) tuples wrapped in `TEPoint`; the neutral element
is (0, 1).  Twisted Edwards addition is complete on this curve (a is a square,
d a non-square => no exceptional cases), which is also what makes the
in-circuit and vectorized device formulas branch-free.
"""

from __future__ import annotations

from dataclasses import dataclass

from cap_tpu.fields.host import FR, FR_EMB

COEFF_A = 168700
COEFF_D = 168696

#: Order of the prime subgroup (the embedded scalar field modulus).
SUBGROUP_ORDER = FR_EMB.p
COFACTOR = 8

# EIP-2494 base point of the prime-order subgroup (G = 8 * generator).
BASE_X = 5299619240641551281634865583518297030282874472190772894086521144482721001553
BASE_Y = 16950150798460657717958625567821834550301663161624707787222815936182638968203

_native_mod = None


def _native():
    """Lazy handle to the C++ accelerator (None if unavailable)."""
    global _native_mod
    if _native_mod is None:
        try:
            from cap_tpu.utils import native

            _native_mod = native if native.HAVE_NATIVE else False
        except Exception:
            _native_mod = False
    return _native_mod if _native_mod is not False else None


@dataclass(frozen=True)
class TEPoint:
    x: int
    y: int

    def is_neutral(self) -> bool:
        return self.x == 0 and self.y == 1

    def on_curve(self) -> bool:
        f = FR
        x2 = f.sq(self.x)
        y2 = f.sq(self.y)
        lhs = (COEFF_A * x2 + y2) % f.p
        rhs = (1 + COEFF_D * x2 % f.p * y2) % f.p
        return lhs == rhs

    def neg(self) -> "TEPoint":
        return TEPoint(FR.neg(self.x), self.y)

    def add(self, other: "TEPoint") -> "TEPoint":
        nat = _native()
        if nat is not None:
            return TEPoint(*nat.te_add(self.x, self.y, other.x, other.y))
        f = FR
        x1, y1, x2, y2 = self.x, self.y, other.x, other.y
        x1x2 = f.mul(x1, x2)
        y1y2 = f.mul(y1, y2)
        x1y2 = f.mul(x1, y2)
        y1x2 = f.mul(y1, x2)
        dxy = f.mul(COEFF_D, f.mul(x1x2, y1y2))
        x3 = f.div(f.add(x1y2, y1x2), f.add(1, dxy))
        y3 = f.div(f.sub(y1y2, f.mul(COEFF_A, x1x2)), f.sub(1, dxy))
        return TEPoint(x3, y3)

    def double(self) -> "TEPoint":
        return self.add(self)

    def mul_scalar(self, k: int) -> "TEPoint":
        k %= SUBGROUP_ORDER * COFACTOR  # safe upper bound for group order
        nat = _native()
        if nat is not None:
            return TEPoint(*nat.te_mul(self.x, self.y, k))
        acc = NEUTRAL
        base = self
        while k:
            if k & 1:
                acc = acc.add(base)
            base = base.double()
            k >>= 1
        return acc

    def in_subgroup(self) -> bool:
        """Prime-order-subgroup membership (cofactor-8 check).

        Baby Jubjub has cofactor 8; a decoded on-curve point may still lie
        outside the prime subgroup and enable small-subgroup confinement.
        The reference validates this on deserialized points
        (src/structs.rs:1425-1591 via ark CanonicalDeserialize)."""
        return self.mul_scalar(SUBGROUP_ORDER).is_neutral()

    def to_coords(self) -> tuple[int, int]:
        return (self.x, self.y)


NEUTRAL = TEPoint(0, 1)
GENERATOR = TEPoint(BASE_X, BASE_Y)


def rand_scalar(rng) -> int:
    """Uniform nonzero embedded-curve scalar."""
    while True:
        s = rng.randrange(SUBGROUP_ORDER)
        if s != 0:
            return s


def rand_point(rng) -> TEPoint:
    """Uniform point of the prime subgroup."""
    return GENERATOR.mul_scalar(rand_scalar(rng))


def te_points_from_x(x: int) -> list:
    """Both curve points with this x (one if y = 0, none if x invalid)."""
    f = FR
    x2 = f.sq(x)
    num = f.sub(1, f.mul(COEFF_A, x2))
    den = f.sub(1, f.mul(COEFF_D, x2))
    y2 = f.div(num, den)
    y = f.sqrt(y2)
    if y is None:
        return []
    if y == 0:
        return [TEPoint(x, 0)]
    return [TEPoint(x, y), TEPoint(x, f.neg(y))]


def point_from_x(x: int, y_parity: int) -> TEPoint | None:
    """Solve the curve equation for y given x; parity selects the root."""
    f = FR
    x2 = f.sq(x)
    num = f.sub(1, f.mul(COEFF_A, x2))
    den = f.sub(1, f.mul(COEFF_D, x2))
    y2 = f.div(num, den)
    y = f.sqrt(y2)
    if y is None:
        return None
    if y % 2 != y_parity % 2:
        y = f.neg(y)
    return TEPoint(x, y)
