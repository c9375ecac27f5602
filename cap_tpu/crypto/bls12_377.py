"""BLS12-377 pairing curve (host-side) — the second CapConfig curve.

The reference binds BLS12-377 via the `bls12_377` cargo feature
(reference src/config.rs:25-84, Cargo.toml:63-68); SURVEY.md §6 notes its
circuits need exactly 2x the bn254 SRS degree.  The curve algebra comes
from the generic BLS12 factory (crypto/bls12.py) instantiated with the
published defining constants: x = 0x8508c00000000001, G1 b = 1,
Fq2 = Fq[u]/(u^2 + 5), Fq6 cubic non-residue xi = u, D-type sextic twist
(E': y^2 = x^3 + 1/u).  The factory derives q, r, the cofactors,
generators (by cofactor clearing — serialization parity with arkworks'
sample generators is NOT claimed), the Jacobian group law and the ate
pairing; derived q/r are asserted against the published moduli below.

The embedded curve is ed_on_bls12_377 (TE a = -1, d = 3021, cofactor 4) —
the CapConfig embedded-curve binding for the bls12_377 feature.  Its
subgroup order and generator are Hasse- and order-verified at import.
"""

from __future__ import annotations

from functools import lru_cache

from cap_tpu.crypto.bls12 import make_bls12

_C = make_bls12(
    name="bls12_377",
    x=0x8508C00000000001,
    b=1,
    nr_c=-5,
    xi=(0, 1),
    twist="D",
)

X = _C.x
Q = _C.Q
R = _C.R
T = _C.T
H1 = _C.H1

assert R == 8444461749428370424248824938781546531375899335154063827935233455917409239041
assert Q == 258664426012969094010652733694893533536393512754914660539884262666720468348340822774968888139573360124440321458177

F12_ONE = _C.F12_ONE
G1_GEN = _C.G1_GEN
G2_GEN = _C.G2_GEN
g1_is_on_curve = _C.g1_is_on_curve
g1_add = _C.g1_add
g1_neg = _C.g1_neg
g1_mul = _C.g1_mul
g2_is_on_curve = _C.g2_is_on_curve
g2_add = _C.g2_add
g2_neg = _C.g2_neg
g2_mul = _C.g2_mul
f12_pow = _C.f12_pow
miller_loop = _C.miller_loop
final_exponentiation = _C.final_exponentiation
pairing = _C.pairing
pairing_check = _C.pairing_check


# -- embedded curve: ed_on_bls12_377 over Fr ----------------------------------

EMB_A = R - 1
EMB_D = 3021
EMB_R = 2111115437357092606062206234695386632838870926408408195193685246394721360383
EMB_H = 4


def emb_add(P, Q_):
    x1, y1 = P
    x2, y2 = Q_
    dx = EMB_D * x1 % R * x2 % R * y1 % R * y2 % R
    x3 = (x1 * y2 + y1 * x2) % R * pow((1 + dx) % R, -1, R) % R
    y3 = (y1 * y2 - EMB_A * x1 % R * x2) % R * pow((1 - dx) % R, -1, R) % R
    return (x3, y3)


def emb_mul(P, k: int):
    res, add = (0, 1), P
    k %= EMB_R
    while k:
        if k & 1:
            res = emb_add(res, add)
        add = emb_add(add, add)
        k >>= 1
    return res


def _emb_mul_raw(P, k: int):
    res, add = (0, 1), P
    while k:
        if k & 1:
            res = emb_add(res, add)
        add = emb_add(add, add)
        k >>= 1
    return res


def _fr_sqrt(a: int) -> int | None:
    from cap_tpu.fields.host import FR_BLS12_377

    try:
        return FR_BLS12_377.sqrt(a)
    except Exception:
        # generic Tonelli-Shanks fallback
        if pow(a, (R - 1) // 2, R) != 1:
            return None
        q1, s = R - 1, 0
        while q1 % 2 == 0:
            q1 //= 2
            s += 1
        z = 2
        while pow(z, (R - 1) // 2, R) != R - 1:
            z += 1
        m, c, t, r0 = s, pow(z, q1, R), pow(a, q1, R), pow(a, (q1 + 1) // 2, R)
        while t != 1:
            i, tmp = 0, t
            while tmp != 1:
                tmp = tmp * tmp % R
                i += 1
            b = pow(c, 1 << (m - i - 1), R)
            m, c = i, b * b % R
            t, r0 = t * c % R, r0 * b % R
        return r0


@lru_cache(maxsize=1)
def _emb_gen():
    import math

    assert abs(EMB_H * EMB_R - (R + 1)) <= 2 * math.isqrt(R) + 1, "Hasse"
    x = 1
    while True:
        num = (1 - EMB_A * x * x) % R
        den = (1 - EMB_D * x * x) % R
        y = _fr_sqrt(num * pow(den, -1, R) % R)
        if y is not None:
            pt = _emb_mul_raw((x, min(y, R - y)), EMB_H)
            if pt != (0, 1):
                assert _emb_mul_raw(pt, EMB_R) == (0, 1), \
                    "embedded generator has wrong order"
                return pt
        x += 1


EMB_GEN = _emb_gen()
