"""In-circuit twisted-Edwards (Baby Jubjub) arithmetic.

The `jf-relation` ECC gadget twin (SURVEY.md §2.2): point variables, the
2-gate complete TE addition using the quintic `ecc` selector, fixed- and
variable-base scalar multiplication, neutral-point predicates.

TE addition (a=168700, d=168696 over Fr) in exactly two TurboPlonk gates:

  x3-gate  wires [x1, y2, x2, y1, x3]:
      mul0*x1*y2 + mul1*x2*y1 + q_ecc*(x1*y2*x2*y1*x3) - x3 = 0
      with mul0 = mul1 = 1, q_ecc = -d    <=>  x3 = (x1y2+x2y1)/(1+d*t)
  y3-gate  wires [x1, x2, y1, y2, y3]:
      mul0*x1*x2 + mul1*y1*y2 + q_ecc*(x1*x2*y1*y2*y3) - y3 = 0
      with mul0 = -a, mul1 = 1, q_ecc = +d <=>  y3 = (y1y2-a*x1x2)/(1-d*t)

(t = x1x2y1y2; addition is complete on this curve so there are no side
conditions — the same property the vectorized device kernels rely on.)
"""

from __future__ import annotations

from dataclasses import dataclass

from cap_tpu.crypto.jubjub import COEFF_A, COEFF_D, TEPoint
from cap_tpu.plonk.circuit import PlonkCircuit


@dataclass(frozen=True)
class PointVariable:
    x: int
    y: int


def create_point_variable(c: PlonkCircuit, pt: TEPoint) -> PointVariable:
    """Witness point: both coordinates are per-prove leaf inputs."""
    return PointVariable(c.load(pt.x), c.load(pt.y))


def create_constant_point_variable(c: PlonkCircuit, pt: TEPoint) -> PointVariable:
    return PointVariable(c.constant(pt.x), c.constant(pt.y))


def neutral_point_variable(c: PlonkCircuit) -> PointVariable:
    return PointVariable(c.zero, c.one)


def point_witness(c: PlonkCircuit, p: PointVariable) -> TEPoint:
    return TEPoint(c.witness(p.x), c.witness(p.y))


def ecc_add(c: PlonkCircuit, p1: PointVariable, p2: PointVariable) -> PointVariable:
    r = point_witness(c, p1).add(point_witness(c, p2))
    x3 = c.hint(r.x, "teadd2", p1.x, p1.y, p2.x, p2.y)
    y3 = c.hint(r.y, "skip")
    c.custom_gate([p1.x, p2.y, p2.x, p1.y, x3], mul0=1, mul1=1, ecc=-COEFF_D, o=1)
    c.custom_gate([p1.x, p2.x, p1.y, p2.y, y3], mul0=-COEFF_A, mul1=1, ecc=COEFF_D, o=1)
    return PointVariable(x3, y3)


def ecc_double(c: PlonkCircuit, p: PointVariable) -> PointVariable:
    return ecc_add(c, p, p)


def ecc_neg(c: PlonkCircuit, p: PointVariable) -> PointVariable:
    return PointVariable(c.mul_constant(p.x, -1), p.y)


def conditional_select_point(
    c: PlonkCircuit, b: int, p0: PointVariable, p1: PointVariable
) -> PointVariable:
    """b == 0 -> p0, b == 1 -> p1."""
    return PointVariable(
        c.conditional_select(b, p0.x, p1.x), c.conditional_select(b, p0.y, p1.y)
    )


def _select_or_neutral(c: PlonkCircuit, b: int, p: PointVariable) -> PointVariable:
    """b ? p : neutral — 2 gates (x = b*px ; y = 1 + b*(py - 1))."""
    xv = c.mul(b, p.x)
    yv_val = 1 + c.witness(b) * (c.witness(p.y) - 1)
    # y = 1 - b + b*py  (aff2: c0 + c1*a + c2*a*b + c3*b with a=b, b=py)
    y = c.hint(yv_val, "aff2", b, p.y, 1, c.f.p - 1, 1, 0)
    c.custom_gate([b, p.y, 0, 0, y], mul0=1, lc0=-1, c=1, o=1)
    return PointVariable(xv, y)


def _select_constant_or_neutral(c: PlonkCircuit, b: int, pt: TEPoint) -> PointVariable:
    """b ? (constant point) : neutral — 2 lc gates."""
    x = c.mul_constant(b, pt.x)
    y = c.lc_with_constant([b], [(pt.y - 1) % c.f.p], 1)
    return PointVariable(x, y)


def fixed_base_scalar_mul(
    c: PlonkCircuit, scalar: int, base: TEPoint, bit_len: int = 251
) -> PointVariable:
    """[scalar] * base for a constant base point; scalar is a circuit var
    whose value must fit bit_len bits (canonical decomposition enforced)."""
    bits = c.unpack(scalar, bit_len)
    return scalar_mul_bits_fixed_base(c, bits, base)


def scalar_mul_bits_fixed_base(c: PlonkCircuit, bits, base: TEPoint) -> PointVariable:
    acc = neutral_point_variable(c)
    cur = base
    for b in bits:
        acc = ecc_add(c, acc, _select_constant_or_neutral(c, b, cur))
        cur = cur.double()
    return acc


def variable_base_scalar_mul(
    c: PlonkCircuit, scalar: int, point: PointVariable, bit_len: int = 251
) -> PointVariable:
    bits = c.unpack(scalar, bit_len)
    return scalar_mul_bits_variable_base(c, bits, point)


def scalar_mul_bits_variable_base(c: PlonkCircuit, bits, point: PointVariable) -> PointVariable:
    """MSB-first double-and-add over an LE bit list."""
    acc = neutral_point_variable(c)
    for b in reversed(bits):
        acc = ecc_double(c, acc)
        acc = ecc_add(c, acc, _select_or_neutral(c, b, point))
    return acc


def is_neutral_point(c: PlonkCircuit, p: PointVariable) -> int:
    bx = c.is_zero(p.x)
    by = c.is_equal(p.y, c.one)
    return c.logic_and(bx, by)


def enforce_point_equal(c: PlonkCircuit, p1: PointVariable, p2: PointVariable) -> None:
    c.enforce_equal(p1.x, p2.x)
    c.enforce_equal(p1.y, p2.y)


def is_point_equal(c: PlonkCircuit, p1: PointVariable, p2: PointVariable) -> int:
    return c.logic_and(c.is_equal(p1.x, p2.x), c.is_equal(p1.y, p2.y))


def enforce_on_curve(c: PlonkCircuit, p: PointVariable) -> None:
    """a*x^2 + y^2 = 1 + d*x^2*y^2 (used when deserializing point vars)."""
    x2 = c.mul(p.x, p.x)
    y2 = c.mul(p.y, p.y)
    # a*x2 + y2 - d*x2*y2 - 1 = 0
    c.custom_gate([x2, y2, x2, y2, 0], lc0=COEFF_A, lc1=1, mul1=-COEFF_D, c=-1)