"""BLS12-377 pairing curve (host-side) — the second CapConfig curve.

The reference binds BLS12-377 via the `bls12_377` cargo feature
(reference src/config.rs:25-84, Cargo.toml:63-68); SURVEY.md §6 notes its
circuits need exactly 2x the bn254 SRS degree.  This module provides the
full host algebra the verifier/SRS layer needs: Fq (377-bit), the
Fq2/Fq6/Fq12 tower (u^2 = -5, v^3 = u, w^2 = v), G1 (y^2 = x^3 + 1),
G2 on the D-type sextic twist (y^2 = x^3 + 1/u), and the ate pairing.

Parameter derivations (verified at import):
  x = 0x8508c00000000001;  r = x^4 - x^2 + 1;  q = ((x-1)^2 r)/3 + x
  #E(Fq) = h1 * r with h1 = (x-1)^2/3  (trace t = x+1)
  twist order  = q^2 + 1 - (t2 - 3f)/2  with t2 = t^2 - 2q,
                 f = sqrt((4q^2 - t2^2)/3)   (CM discriminant -3)
Generators are derived by cofactor-clearing the lexicographically-first
curve points — serialization parity with arkworks' sample generators is NOT
claimed (no vectors in this environment); all protocol-level properties
(prime order r, pairing bilinearity) are asserted in tests.

The pairing lifts G2 through the untwist (x', y') -> (x' w^2, y' w^3) and
runs a plain affine Miller loop over E(Fq12) with tower-inversion line
slopes — correctness-first: this curve backs the CPU-suite multi-curve
proof, while bn254 carries the TPU production path.
"""

from __future__ import annotations

from functools import lru_cache

# -- parameters --------------------------------------------------------------

X = 0x8508C00000000001
R = X**4 - X**2 + 1
Q = ((X - 1) ** 2 * R) // 3 + X
T = X + 1                      # Frobenius trace of E(Fq)
H1 = (X - 1) ** 2 // 3         # G1 cofactor

assert R == 8444461749428370424248824938781546531375899335154063827935233455917409239041
assert Q == 258664426012969094010652733694893533536393512754914660539884262666720468348340822774968888139573360124440321458177
assert (Q + 1 - T) == H1 * R

_NR = Q - 5  # Fq2 non-residue: u^2 = -5


# -- Fq2 ----------------------------------------------------------------------

F2_ZERO = (0, 0)
F2_ONE = (1, 0)


def f2_add(a, b):
    return ((a[0] + b[0]) % Q, (a[1] + b[1]) % Q)


def f2_sub(a, b):
    return ((a[0] - b[0]) % Q, (a[1] - b[1]) % Q)


def f2_neg(a):
    return ((-a[0]) % Q, (-a[1]) % Q)


def f2_mul(a, b):
    a0, a1 = a
    b0, b1 = b
    return ((a0 * b0 + _NR * a1 * b1) % Q, (a0 * b1 + a1 * b0) % Q)


def f2_sqr(a):
    return f2_mul(a, a)


def f2_muls(a, s: int):
    return (a[0] * s % Q, a[1] * s % Q)


def f2_inv(a):
    a0, a1 = a
    ni = pow((a0 * a0 - _NR * a1 * a1) % Q, -1, Q)
    return (a0 * ni % Q, (-a1 * ni) % Q)


def f2_mul_by_u(a):
    """multiply by u: (a0 + a1 u) u = -5 a1 + a0 u."""
    return (_NR * a[1] % Q, a[0])


# -- Fq6 = Fq2[v]/(v^3 - u) ----------------------------------------------------

F6_ZERO = (F2_ZERO, F2_ZERO, F2_ZERO)
F6_ONE = (F2_ONE, F2_ZERO, F2_ZERO)


def f6_add(a, b):
    return tuple(f2_add(x, y) for x, y in zip(a, b))


def f6_sub(a, b):
    return tuple(f2_sub(x, y) for x, y in zip(a, b))


def f6_neg(a):
    return tuple(f2_neg(x) for x in a)


def f6_mul(a, b):
    a0, a1, a2 = a
    b0, b1, b2 = b
    t0 = f2_mul(a0, b0)
    t1 = f2_mul(a1, b1)
    t2 = f2_mul(a2, b2)
    c0 = f2_add(t0, f2_mul_by_u(f2_sub(f2_mul(f2_add(a1, a2), f2_add(b1, b2)), f2_add(t1, t2))))
    c1 = f2_add(f2_sub(f2_mul(f2_add(a0, a1), f2_add(b0, b1)), f2_add(t0, t1)), f2_mul_by_u(t2))
    c2 = f2_add(f2_sub(f2_mul(f2_add(a0, a2), f2_add(b0, b2)), f2_add(t0, t2)), t1)
    return (c0, c1, c2)


def f6_sqr(a):
    return f6_mul(a, a)


def f6_mul_by_v(a):
    """(a0 + a1 v + a2 v^2) v = a2 u + a0 v + a1 v^2."""
    return (f2_mul_by_u(a[2]), a[0], a[1])


def f6_inv(a):
    a0, a1, a2 = a
    c0 = f2_sub(f2_sqr(a0), f2_mul_by_u(f2_mul(a1, a2)))
    c1 = f2_sub(f2_mul_by_u(f2_sqr(a2)), f2_mul(a0, a1))
    c2 = f2_sub(f2_sqr(a1), f2_mul(a0, a2))
    norm = f2_add(f2_mul(a0, c0), f2_mul_by_u(f2_add(f2_mul(a2, c1), f2_mul(a1, c2))))
    ni = f2_inv(norm)
    return (f2_mul(c0, ni), f2_mul(c1, ni), f2_mul(c2, ni))


# -- Fq12 = Fq6[w]/(w^2 - v) ----------------------------------------------------

F12_ONE = (F6_ONE, F6_ZERO)


def f12_add(a, b):
    return (f6_add(a[0], b[0]), f6_add(a[1], b[1]))


def f12_sub(a, b):
    return (f6_sub(a[0], b[0]), f6_sub(a[1], b[1]))


def f12_mul(a, b):
    a0, a1 = a
    b0, b1 = b
    t0 = f6_mul(a0, b0)
    t1 = f6_mul(a1, b1)
    c0 = f6_add(t0, f6_mul_by_v(t1))
    c1 = f6_sub(f6_mul(f6_add(a0, a1), f6_add(b0, b1)), f6_add(t0, t1))
    return (c0, c1)


def f12_sqr(a):
    return f12_mul(a, a)


def f12_conj(a):
    return (a[0], f6_neg(a[1]))


def f12_inv(a):
    a0, a1 = a
    norm = f6_sub(f6_sqr(a0), f6_mul_by_v(f6_sqr(a1)))
    ni = f6_inv(norm)
    return (f6_mul(a0, ni), f6_neg(f6_mul(a1, ni)))


def f12_pow(a, e: int):
    res = F12_ONE
    base = a
    while e:
        if e & 1:
            res = f12_mul(res, base)
        base = f12_sqr(base)
        e >>= 1
    return res


def _f12_from_fq(c: int):
    return (((c % Q, 0), F2_ZERO, F2_ZERO), F6_ZERO)


def _f12_from_fq2_w2(a):
    """a * w^2 = a * v  (an Fq2 coefficient placed at v of the even part)."""
    return ((F2_ZERO, a, F2_ZERO), F6_ZERO)


def _f12_from_fq2_w3(a):
    """a * w^3 = a * v w  (placed at v of the odd part)."""
    return (F6_ZERO, (F2_ZERO, a, F2_ZERO))


# -- G1: y^2 = x^3 + 1 over Fq ---------------------------------------------------


def g1_is_on_curve(pt) -> bool:
    if pt is None:
        return True
    x, y = pt
    return (y * y - (x * x * x + 1)) % Q == 0


def g1_add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if (y1 + y2) % Q == 0:
            return None
        lam = 3 * x1 * x1 % Q * pow(2 * y1 % Q, -1, Q) % Q
    else:
        lam = (y2 - y1) % Q * pow((x2 - x1) % Q, -1, Q) % Q
    x3 = (lam * lam - x1 - x2) % Q
    return (x3, (lam * (x1 - x3) - y1) % Q)


def g1_neg(pt):
    return None if pt is None else (pt[0], (-pt[1]) % Q)


# Jacobian coordinates (X, Y, Z): x = X/Z^2, y = Y/Z^3 — one inversion per
# scalar mul instead of one per group op (the affine ladder spent ~80% of
# its time in 377-bit inversions).


def _jac_dbl(P):
    X1, Y1, Z1 = P
    if Y1 == 0:
        return (0, 1, 0)
    A = X1 * X1 % Q
    B = Y1 * Y1 % Q
    C = B * B % Q
    D = 2 * ((X1 + B) * (X1 + B) - A - C) % Q
    E = 3 * A % Q
    F = E * E % Q
    X3 = (F - 2 * D) % Q
    Y3 = (E * (D - X3) - 8 * C) % Q
    Z3 = 2 * Y1 * Z1 % Q
    return (X3, Y3, Z3)


def _jac_add(P, Q_):
    if P[2] == 0:
        return Q_
    if Q_[2] == 0:
        return P
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q_
    Z1Z1 = Z1 * Z1 % Q
    Z2Z2 = Z2 * Z2 % Q
    U1 = X1 * Z2Z2 % Q
    U2 = X2 * Z1Z1 % Q
    S1 = Y1 * Z2 % Q * Z2Z2 % Q
    S2 = Y2 * Z1 % Q * Z1Z1 % Q
    if U1 == U2:
        if S1 != S2:
            return (0, 1, 0)
        return _jac_dbl(P)
    H = (U2 - U1) % Q
    I_ = 4 * H * H % Q
    J = H * I_ % Q
    r_ = 2 * (S2 - S1) % Q
    V = U1 * I_ % Q
    X3 = (r_ * r_ - J - 2 * V) % Q
    Y3 = (r_ * (V - X3) - 2 * S1 * J) % Q
    Z3 = ((Z1 + Z2) * (Z1 + Z2) - Z1Z1 - Z2Z2) % Q * H % Q
    return (X3, Y3, Z3)


def _jac_norm(P):
    X, Y, Z = P
    if Z == 0:
        return None
    zi = pow(Z, -1, Q)
    zi2 = zi * zi % Q
    return (X * zi2 % Q, Y * zi2 % Q * zi % Q)


def g1_mul(pt, k: int):
    k %= R
    if pt is None or k == 0:
        return None
    res = (0, 1, 0)
    add = (pt[0], pt[1], 1)
    while k:
        if k & 1:
            res = _jac_add(res, add)
        add = _jac_dbl(add)
        k >>= 1
    return _jac_norm(res)


def _sqrt_fq(a: int) -> int | None:
    """Tonelli-Shanks in Fq (q-1 = 2^46 * odd)."""
    a %= Q
    if a == 0:
        return 0
    if pow(a, (Q - 1) // 2, Q) != 1:
        return None
    q1, s = Q - 1, 0
    while q1 % 2 == 0:
        q1 //= 2
        s += 1
    z = 2
    while pow(z, (Q - 1) // 2, Q) != Q - 1:
        z += 1
    m, c, t, r_ = s, pow(z, q1, Q), pow(a, q1, Q), pow(a, (q1 + 1) // 2, Q)
    while t != 1:
        i, tmp = 0, t
        while tmp != 1:
            tmp = tmp * tmp % Q
            i += 1
        b = pow(c, 1 << (m - i - 1), Q)
        m, c = i, b * b % Q
        t, r_ = t * c % Q, r_ * b % Q
    return r_


@lru_cache(maxsize=1)
def _g1_gen():
    x = 1
    while True:
        y = _sqrt_fq(x * x * x + 1)
        if y is not None:
            pt = g1_mul((x, min(y, Q - y)), H1)
            if pt is not None:
                assert g1_mul(pt, R) is None
                return pt
        x += 1


# -- G2: y^2 = x^3 + 1/u over Fq2 (D-twist) --------------------------------------

B2 = f2_inv((0, 1))  # 1/u = (0, -1/5)


def g2_is_on_curve(pt) -> bool:
    if pt is None:
        return True
    x, y = pt
    return f2_sub(f2_sqr(y), f2_add(f2_mul(f2_sqr(x), x), B2)) == F2_ZERO


def g2_add(p1, p2):
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if f2_add(y1, y2) == F2_ZERO:
            return None
        lam = f2_mul(f2_muls(f2_sqr(x1), 3), f2_inv(f2_muls(y1, 2)))
    else:
        lam = f2_mul(f2_sub(y2, y1), f2_inv(f2_sub(x2, x1)))
    x3 = f2_sub(f2_sub(f2_sqr(lam), x1), x2)
    return (x3, f2_sub(f2_mul(lam, f2_sub(x1, x3)), y1))


def g2_neg(pt):
    return None if pt is None else (pt[0], f2_neg(pt[1]))


def g2_mul(pt, k: int):
    return _g2_mul_raw(pt, k % R)


def _jac2_dbl(P):
    X1, Y1, Z1 = P
    if Y1 == F2_ZERO:
        return (F2_ZERO, F2_ONE, F2_ZERO)
    A = f2_sqr(X1)
    B = f2_sqr(Y1)
    C = f2_sqr(B)
    D = f2_muls(f2_sub(f2_sqr(f2_add(X1, B)), f2_add(A, C)), 2)
    E = f2_muls(A, 3)
    F_ = f2_sqr(E)
    X3 = f2_sub(F_, f2_muls(D, 2))
    Y3 = f2_sub(f2_mul(E, f2_sub(D, X3)), f2_muls(C, 8))
    Z3 = f2_muls(f2_mul(Y1, Z1), 2)
    return (X3, Y3, Z3)


def _jac2_add(P, Q_):
    if P[2] == F2_ZERO:
        return Q_
    if Q_[2] == F2_ZERO:
        return P
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q_
    Z1Z1 = f2_sqr(Z1)
    Z2Z2 = f2_sqr(Z2)
    U1 = f2_mul(X1, Z2Z2)
    U2 = f2_mul(X2, Z1Z1)
    S1 = f2_mul(f2_mul(Y1, Z2), Z2Z2)
    S2 = f2_mul(f2_mul(Y2, Z1), Z1Z1)
    if U1 == U2:
        if S1 != S2:
            return (F2_ZERO, F2_ONE, F2_ZERO)
        return _jac2_dbl(P)
    H = f2_sub(U2, U1)
    I_ = f2_muls(f2_sqr(H), 4)
    J = f2_mul(H, I_)
    r_ = f2_muls(f2_sub(S2, S1), 2)
    V = f2_mul(U1, I_)
    X3 = f2_sub(f2_sub(f2_sqr(r_), J), f2_muls(V, 2))
    Y3 = f2_sub(f2_mul(r_, f2_sub(V, X3)), f2_muls(f2_mul(S1, J), 2))
    Z3 = f2_mul(f2_sub(f2_sub(f2_sqr(f2_add(Z1, Z2)), Z1Z1), Z2Z2), H)
    return (X3, Y3, Z3)


def _g2_mul_raw(pt, k: int):
    if pt is None or k == 0:
        return None
    res = (F2_ZERO, F2_ONE, F2_ZERO)
    add = (pt[0], pt[1], F2_ONE)
    while k:
        if k & 1:
            res = _jac2_add(res, add)
        add = _jac2_dbl(add)
        k >>= 1
    if res[2] == F2_ZERO:
        return None
    zi = f2_inv(res[2])
    zi2 = f2_sqr(zi)
    return (f2_mul(res[0], zi2), f2_mul(f2_mul(res[1], zi2), zi))


@lru_cache(maxsize=1)
def _twist_cofactor() -> int:
    import math

    t2 = T * T - 2 * Q
    f = math.isqrt((4 * Q * Q - t2 * t2) // 3)
    assert f * f == (4 * Q * Q - t2 * t2) // 3
    order = Q * Q + 1 - (t2 - 3 * f) // 2
    assert order % R == 0
    return order // R


def _f2_sqrt(a):
    """Tonelli-Shanks in Fq2 (the group Fq2* is cyclic of order q^2-1)."""
    if a == F2_ZERO:
        return F2_ZERO

    def f2p(x, e):
        res, b = F2_ONE, x
        while e:
            if e & 1:
                res = f2_mul(res, b)
            b = f2_sqr(b)
            e >>= 1
        return res

    n = Q * Q - 1
    if f2p(a, n // 2) != F2_ONE:
        return None
    q1, s = n, 0
    while q1 % 2 == 0:
        q1 //= 2
        s += 1
    z = (2, 1)
    while f2p(z, n // 2) == F2_ONE:
        z = (z[0] + 1, z[1])
    m, c, t, r_ = s, f2p(z, q1), f2p(a, q1), f2p(a, (q1 + 1) // 2)
    while t != F2_ONE:
        i, tmp = 0, t
        while tmp != F2_ONE:
            tmp = f2_sqr(tmp)
            i += 1
        b = c
        for _ in range(m - i - 1):
            b = f2_sqr(b)
        m, c = i, f2_sqr(b)
        t, r_ = f2_mul(t, c), f2_mul(r_, b)
    return r_


@lru_cache(maxsize=1)
def _g2_gen():
    h2 = _twist_cofactor()
    x = (1, 0)
    while True:
        y = _f2_sqrt(f2_add(f2_mul(f2_sqr(x), x), B2))
        if y is not None:
            pt = _g2_mul_raw((x, y), h2)
            if pt is not None:
                assert _g2_mul_raw(pt, R) is None
                return pt
        x = (x[0] + 1, x[1])


G1_GEN = _g1_gen()
G2_GEN = _g2_gen()


# -- pairing ----------------------------------------------------------------------


def _untwist(pt):
    """E'(Fq2) -> E(Fq12): (x', y') -> (x' w^2, y' w^3)."""
    x, y = pt
    return (_f12_from_fq2_w2(x), _f12_from_fq2_w3(y))


def _lift_g1(pt):
    return (_f12_from_fq(pt[0]), _f12_from_fq(pt[1]))


def _line(T_, Q_, P_):
    """Evaluate the line through T_ and Q_ (or the tangent when equal) at P_
    — all points on E(Fq12) in affine coordinates."""
    xT, yT = T_
    xQ, yQ = Q_
    xP, yP = P_
    if xT == xQ and yT == yQ:
        num = f12_mul(_f12_from_fq(3), f12_sqr(xT))
        den = f12_mul(_f12_from_fq(2), yT)
    elif xT == xQ:
        # vertical line: x - xT
        return f12_sub(xP, xT)
    else:
        num = f12_sub(yQ, yT)
        den = f12_sub(xQ, xT)
    lam = f12_mul(num, f12_inv(den))
    return f12_sub(f12_sub(yP, yT), f12_mul(lam, f12_sub(xP, xT)))


def miller_loop(p_g1, q_g2):
    """f_{X, Q}(P) for the BLS ate pairing (X > 0, plain double-and-add)."""
    if p_g1 is None or q_g2 is None:
        return F12_ONE
    P_ = _lift_g1(p_g1)
    Q_ = _untwist(q_g2)
    f = F12_ONE
    T_ = Q_
    Tp = q_g2  # track the twist point for cheap group law
    bits = bin(X)[3:]  # skip leading 1
    for b in bits:
        f = f12_mul(f12_sqr(f), _line(T_, T_, P_))
        Tp = g2_add(Tp, Tp)
        T_ = _untwist(Tp)
        if b == "1":
            f = f12_mul(f, _line(T_, Q_, P_))
            Tp = g2_add(Tp, q_g2)
            T_ = _untwist(Tp)
    return f


@lru_cache(maxsize=1)
def _final_exp_hard() -> int:
    return (Q**4 - Q**2 + 1) // R


def final_exponentiation(f):
    """f^((q^12-1)/r): easy part by Frobenius-free inversions, hard part by
    plain exponentiation of the ~1255-bit (q^4 - q^2 + 1)/r (correctness-
    first; the x-chain optimization is a host micro-opt, not a TPU path)."""
    # easy: f^(q^6-1) = conj(f) * f^-1 ; then ^(q^2+1)
    f1 = f12_mul(f12_conj(f), f12_inv(f))
    f2 = f12_mul(f12_pow(f1, Q * Q), f1)
    return f12_pow(f2, _final_exp_hard())


def pairing(p_g1, q_g2):
    return final_exponentiation(miller_loop(p_g1, q_g2))


def pairing_check(pairs) -> bool:
    """prod e(P_i, Q_i) == 1 (one shared final exponentiation)."""
    acc = F12_ONE
    for p_, q_ in pairs:
        if p_ is None or q_ is None:
            continue
        acc = f12_mul(acc, miller_loop(p_, q_))
    return final_exponentiation(acc) == F12_ONE


# -- embedded curve: ed_on_bls12_377 (twisted Edwards over Fr) ---------------------
#
# a x^2 + y^2 = 1 + d x^2 y^2 with a = -1, d = 3021 over the BLS12-377
# scalar field; prime subgroup order EMB_R, cofactor 4.  Parameters are
# verified at import: 4*EMB_R lies in the Hasse interval and annihilates
# the derived generator.  This is the CapConfig embedded-curve binding for
# the bls12_377 feature (reference config.rs:63-84).

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
            # cofactor-clear (raw ladder — emb_mul reduces mod EMB_R)
            res, add, k = (0, 1), (x, min(y, R - y)), EMB_H
            while k:
                if k & 1:
                    res = emb_add(res, add)
                add = emb_add(add, add)
                k >>= 1
            if res != (0, 1):
                chk, add2, k2 = (0, 1), res, EMB_R
                while k2:
                    if k2 & 1:
                        chk = emb_add(chk, add2)
                    add2 = emb_add(add2, add2)
                    k2 >>= 1
                assert chk == (0, 1), "embedded generator has wrong order"
                return res
        x += 1


EMB_GEN = _emb_gen()
