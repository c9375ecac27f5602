"""BLS12-381 pairing curve (host-side) — the third CapConfig curve.

Instantiates the generic BLS12 construction (crypto/bls12.py) with the
published defining constants (reference src/config.rs:25-84 `bls12_381`
feature): x = -0xd201000000010000 (negative — the Miller loop runs over
|x| and conjugates), G1 b = 4, Fq2 = Fq[u]/(u^2+1), Fq6 cubic non-residue
xi = u+1, M-type sextic twist (E': y^2 = x^3 + 4(u+1)).

The embedded curve is Jubjub (ed_on_bls12_381): twisted Edwards a = -1,
d = -(10240/10241), cofactor 8 — parameters verified at import (Hasse
interval + generator order assertion).  Generators here are derived by
cofactor clearing, as for the other curves (protocol-equivalent to
arkworks' sample points; serialization parity unclaimed).
"""

from __future__ import annotations

from functools import lru_cache

from cap_tpu.crypto.bls12 import make_bls12

_C = make_bls12(
    name="bls12_381",
    x=-0xD201000000010000,
    b=4,
    nr_c=-1,
    xi=(1, 1),
    twist="M",
)

X = _C.x
Q = _C.Q
R = _C.R
H1 = _C.H1
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


# -- embedded curve: Jubjub / ed_on_bls12_381 over Fr -------------------------

EMB_A = R - 1
EMB_D = (-10240 * pow(10241, -1, R)) % R
EMB_R = 0x0E7DB4EA6533AFA906673B0101343B00A6682093CCC81082D0970E5ED6F72CB7
EMB_H = 8


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
    a %= R
    if a == 0:
        return 0
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
                assert _emb_mul_raw(pt, EMB_R) == (0, 1), "wrong subgroup order"
                return pt
        x += 1


EMB_GEN = _emb_gen()
