"""Generic BLS12 pairing-curve construction from defining constants.

One factory covers every BLS12 family member the reference's CapConfig can
bind (src/config.rs:25-84 features bls12_377 / bls12_381): given the BLS
parameter x (sign included), the G1 coefficient b, the Fq2 non-residue c
(u^2 = c), the Fq6 cubic non-residue xi (v^3 = xi, w^2 = v) and the twist
type, it derives q, r, the cofactors (G2's from the CM-discriminant
twist-order formula), generators (by cofactor clearing, order-asserted),
Jacobian group law, and the ate pairing (untwisted affine Miller loop with
tower inversions; negative x handled by conjugating the Miller output —
inversion and conjugation agree after the final exponentiation).

Everything is host-side Python (the verifier/SRS tier); the production
bn254 path keeps its specialized device kernels.
"""

from __future__ import annotations

import math
from types import SimpleNamespace


def make_bls12(*, name: str, x: int, b: int, nr_c: int, xi: tuple,
               twist: str) -> SimpleNamespace:
    R = x**4 - x**2 + 1
    assert ((x - 1) ** 2 * R) % 3 == 0
    Q = ((x - 1) ** 2 * R) // 3 + x
    T = x + 1
    H1 = (x - 1) ** 2 // 3
    assert (Q + 1 - T) == H1 * R
    NR = nr_c % Q

    # -- Fq2 ------------------------------------------------------------
    F2_ZERO, F2_ONE = (0, 0), (1, 0)

    def f2_add(a, b2):
        return ((a[0] + b2[0]) % Q, (a[1] + b2[1]) % Q)

    def f2_sub(a, b2):
        return ((a[0] - b2[0]) % Q, (a[1] - b2[1]) % Q)

    def f2_neg(a):
        return ((-a[0]) % Q, (-a[1]) % Q)

    def f2_mul(a, b2):
        a0, a1 = a
        b0, b1 = b2
        return ((a0 * b0 + NR * a1 * b1) % Q, (a0 * b1 + a1 * b0) % Q)

    def f2_sqr(a):
        return f2_mul(a, a)

    def f2_muls(a, s):
        return (a[0] * s % Q, a[1] * s % Q)

    def f2_inv(a):
        a0, a1 = a
        ni = pow((a0 * a0 - NR * a1 * a1) % Q, -1, Q)
        return (a0 * ni % Q, (-a1 * ni) % Q)

    XI = (xi[0] % Q, xi[1] % Q)

    def f2_mul_by_xi(a):
        return f2_mul(a, XI)

    # -- Fq6 = Fq2[v]/(v^3 - xi) -----------------------------------------
    F6_ZERO = (F2_ZERO, F2_ZERO, F2_ZERO)
    F6_ONE = (F2_ONE, F2_ZERO, F2_ZERO)

    def f6_add(a, b6):
        return tuple(f2_add(p, q) for p, q in zip(a, b6))

    def f6_sub(a, b6):
        return tuple(f2_sub(p, q) for p, q in zip(a, b6))

    def f6_neg(a):
        return tuple(f2_neg(p) for p in a)

    def f6_mul(a, b6):
        a0, a1, a2 = a
        b0, b1, b2 = b6
        t0, t1, t2 = f2_mul(a0, b0), f2_mul(a1, b1), f2_mul(a2, b2)
        c0 = f2_add(t0, f2_mul_by_xi(
            f2_sub(f2_mul(f2_add(a1, a2), f2_add(b1, b2)), f2_add(t1, t2))))
        c1 = f2_add(
            f2_sub(f2_mul(f2_add(a0, a1), f2_add(b0, b1)), f2_add(t0, t1)),
            f2_mul_by_xi(t2))
        c2 = f2_add(
            f2_sub(f2_mul(f2_add(a0, a2), f2_add(b0, b2)), f2_add(t0, t2)), t1)
        return (c0, c1, c2)

    def f6_sqr(a):
        return f6_mul(a, a)

    def f6_mul_by_v(a):
        return (f2_mul_by_xi(a[2]), a[0], a[1])

    def f6_inv(a):
        a0, a1, a2 = a
        c0 = f2_sub(f2_sqr(a0), f2_mul_by_xi(f2_mul(a1, a2)))
        c1 = f2_sub(f2_mul_by_xi(f2_sqr(a2)), f2_mul(a0, a1))
        c2 = f2_sub(f2_sqr(a1), f2_mul(a0, a2))
        norm = f2_add(f2_mul(a0, c0),
                      f2_mul_by_xi(f2_add(f2_mul(a2, c1), f2_mul(a1, c2))))
        ni = f2_inv(norm)
        return (f2_mul(c0, ni), f2_mul(c1, ni), f2_mul(c2, ni))

    # -- Fq12 = Fq6[w]/(w^2 - v) -------------------------------------------
    F12_ONE = (F6_ONE, F6_ZERO)

    def f12_mul(a, b12):
        a0, a1 = a
        b0, b1 = b12
        t0, t1 = f6_mul(a0, b0), f6_mul(a1, b1)
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

    def f12_pow(a, e):
        res, base = F12_ONE, a
        while e:
            if e & 1:
                res = f12_mul(res, base)
            base = f12_sqr(base)
            e >>= 1
        return res

    def f12_from_fq(c):
        return (((c % Q, 0), F2_ZERO, F2_ZERO), F6_ZERO)

    def f12_from_fq2(a):
        return ((a, F2_ZERO, F2_ZERO), F6_ZERO)

    W1 = (F6_ZERO, F6_ONE)                      # w
    W2 = ((F2_ZERO, F2_ONE, F2_ZERO), F6_ZERO)  # w^2 = v
    W3 = (F6_ZERO, (F2_ZERO, F2_ONE, F2_ZERO))  # w^3 = v w

    # -- G1: y^2 = x^3 + b over Fq --------------------------------------------
    def g1_is_on_curve(pt):
        if pt is None:
            return True
        xx, yy = pt
        return (yy * yy - (xx * xx * xx + b)) % Q == 0

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
        return (X3, (E * (D - X3) - 8 * C) % Q, 2 * Y1 * Z1 % Q)

    def _jac_add(P, Q_):
        if P[2] == 0:
            return Q_
        if Q_[2] == 0:
            return P
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q_
        Z1Z1, Z2Z2 = Z1 * Z1 % Q, Z2 * Z2 % Q
        U1, U2 = X1 * Z2Z2 % Q, X2 * Z1Z1 % Q
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

    def g1_mul(pt, k):
        k %= R
        if pt is None or k == 0:
            return None
        res, add = (0, 1, 0), (pt[0], pt[1], 1)
        while k:
            if k & 1:
                res = _jac_add(res, add)
            add = _jac_dbl(add)
            k >>= 1
        X, Y, Z = res
        if Z == 0:
            return None
        zi = pow(Z, -1, Q)
        zi2 = zi * zi % Q
        return (X * zi2 % Q, Y * zi2 % Q * zi % Q)

    def _sqrt_fq(a):
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
            bb = pow(c, 1 << (m - i - 1), Q)
            m, c = i, bb * bb % Q
            t, r_ = t * c % Q, r_ * bb % Q
        return r_

    def _g1_gen():
        xx = 1
        while True:
            yy = _sqrt_fq(xx * xx * xx + b)
            if yy is not None:
                pt = g1_mul((xx, min(yy, Q - yy)), H1)
                if pt is not None:
                    assert g1_mul(pt, R) is None
                    return pt
            xx += 1

    # -- G2 on the sextic twist over Fq2 ---------------------------------------
    if twist == "D":
        B2 = f2_mul((b % Q, 0), f2_inv(XI))
    elif twist == "M":
        B2 = f2_muls(XI, b)
    else:
        raise ValueError(f"twist must be D or M, got {twist!r}")

    def g2_is_on_curve(pt):
        if pt is None:
            return True
        xx, yy = pt
        return f2_sub(f2_sqr(yy), f2_add(f2_mul(f2_sqr(xx), xx), B2)) == F2_ZERO

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

    def _jac2_dbl(P):
        X1, Y1, Z1 = P
        if Y1 == F2_ZERO:
            return (F2_ZERO, F2_ONE, F2_ZERO)
        A = f2_sqr(X1)
        B_ = f2_sqr(Y1)
        C = f2_sqr(B_)
        D = f2_muls(f2_sub(f2_sqr(f2_add(X1, B_)), f2_add(A, C)), 2)
        E = f2_muls(A, 3)
        F = f2_sqr(E)
        X3 = f2_sub(F, f2_muls(D, 2))
        Y3 = f2_sub(f2_mul(E, f2_sub(D, X3)), f2_muls(C, 8))
        return (X3, Y3, f2_muls(f2_mul(Y1, Z1), 2))

    def _jac2_add(P, Q_):
        if P[2] == F2_ZERO:
            return Q_
        if Q_[2] == F2_ZERO:
            return P
        X1, Y1, Z1 = P
        X2, Y2, Z2 = Q_
        Z1Z1, Z2Z2 = f2_sqr(Z1), f2_sqr(Z2)
        U1, U2 = f2_mul(X1, Z2Z2), f2_mul(X2, Z1Z1)
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

    def _g2_mul_raw(pt, k):
        if pt is None or k == 0:
            return None
        res, add = (F2_ZERO, F2_ONE, F2_ZERO), (pt[0], pt[1], F2_ONE)
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

    def g2_mul(pt, k):
        return _g2_mul_raw(pt, k % R)

    def _twist_cofactor():
        t2 = T * T - 2 * Q
        f = math.isqrt((4 * Q * Q - t2 * t2) // 3)
        assert f * f == (4 * Q * Q - t2 * t2) // 3
        for trace in (
            (t2 - 3 * f) // 2, (t2 + 3 * f) // 2,
            (-t2 - 3 * f) // 2, (-t2 + 3 * f) // 2,
        ):
            order = Q * Q + 1 - trace
            if order % R == 0:
                return order // R
        raise AssertionError("no twist order divisible by r")

    def _f2_pow(a, e):
        res, base = F2_ONE, a
        while e:
            if e & 1:
                res = f2_mul(res, base)
            base = f2_sqr(base)
            e >>= 1
        return res

    def _f2_sqrt(a):
        if a == F2_ZERO:
            return F2_ZERO
        n = Q * Q - 1
        if _f2_pow(a, n // 2) != F2_ONE:
            return None
        q1, s = n, 0
        while q1 % 2 == 0:
            q1 //= 2
            s += 1
        z = (2, 1)
        while _f2_pow(z, n // 2) == F2_ONE:
            z = (z[0] + 1, z[1])
        m, c, t, r_ = s, _f2_pow(z, q1), _f2_pow(a, q1), _f2_pow(a, (q1 + 1) // 2)
        while t != F2_ONE:
            i, tmp = 0, t
            while tmp != F2_ONE:
                tmp = f2_sqr(tmp)
                i += 1
            bb = c
            for _ in range(m - i - 1):
                bb = f2_sqr(bb)
            m, c = i, f2_sqr(bb)
            t, r_ = f2_mul(t, c), f2_mul(r_, bb)
        return r_

    def _g2_gen():
        h2 = _twist_cofactor()
        xx = (1, 0)
        while True:
            yy = _f2_sqrt(f2_add(f2_mul(f2_sqr(xx), xx), B2))
            if yy is not None:
                pt = _g2_mul_raw((xx, yy), h2)
                if pt is not None:
                    assert _g2_mul_raw(pt, R) is None
                    return pt
            xx = (xx[0] + 1, xx[1])

    G1_GEN = _g1_gen()
    G2_GEN = _g2_gen()

    # -- pairing --------------------------------------------------------------
    # untwist psi: E'(Fq2) -> E(Fq12).  D: (x', y') -> (x' w^2, y' w^3);
    # M: (x', y') -> (x' / w^2, y' / w^3).
    if twist == "D":
        UNTW_X, UNTW_Y = W2, W3
    else:
        UNTW_X, UNTW_Y = f12_inv(W2), f12_inv(W3)

    def _untwist(pt):
        xx, yy = pt
        return (f12_mul(f12_from_fq2(xx), UNTW_X),
                f12_mul(f12_from_fq2(yy), UNTW_Y))

    def _lift_g1(pt):
        return (f12_from_fq(pt[0]), f12_from_fq(pt[1]))

    F12_TWO = f12_from_fq(2)
    F12_THREE = f12_from_fq(3)

    def f12_sub(a, b12):
        return (f6_sub(a[0], b12[0]), f6_sub(a[1], b12[1]))

    def _line(T_, Q12, P12):
        xT, yT = T_
        xQ, yQ = Q12
        xP, yP = P12
        if xT == xQ and yT == yQ:
            num = f12_mul(F12_THREE, f12_sqr(xT))
            den = f12_mul(F12_TWO, yT)
        elif xT == xQ:
            return f12_sub(xP, xT)  # vertical line
        else:
            num = f12_sub(yQ, yT)
            den = f12_sub(xQ, xT)
        lam = f12_mul(num, f12_inv(den))
        return f12_sub(f12_sub(yP, yT), f12_mul(lam, f12_sub(xP, xT)))

    X_ABS = abs(x)
    X_NEG = x < 0

    def miller_loop(p_g1, q_g2):
        if p_g1 is None or q_g2 is None:
            return F12_ONE
        P12 = _lift_g1(p_g1)
        Q12 = _untwist(q_g2)
        f = F12_ONE
        Tp = q_g2
        T12 = Q12
        for bit in bin(X_ABS)[3:]:
            f = f12_mul(f12_sqr(f), _line(T12, T12, P12))
            Tp = g2_add(Tp, Tp)
            T12 = _untwist(Tp)
            if bit == "1":
                f = f12_mul(f, _line(T12, Q12, P12))
                Tp = g2_add(Tp, q_g2)
                T12 = _untwist(Tp)
        if X_NEG:
            # f_{-n} differs from conj(f_n) by a factor the final
            # exponentiation kills (unitary quotient)
            f = f12_conj(f)
        return f

    HARD_EXP = (Q**4 - Q**2 + 1) // R

    def final_exponentiation(f):
        f1 = f12_mul(f12_conj(f), f12_inv(f))
        f2 = f12_mul(f12_pow(f1, Q * Q), f1)
        return f12_pow(f2, HARD_EXP)

    def pairing(p_g1, q_g2):
        return final_exponentiation(miller_loop(p_g1, q_g2))

    def pairing_check(pairs):
        acc = F12_ONE
        for p_, q_ in pairs:
            if p_ is None or q_ is None:
                continue
            acc = f12_mul(acc, miller_loop(p_, q_))
        return final_exponentiation(acc) == F12_ONE

    return SimpleNamespace(
        name=name, x=x, Q=Q, R=R, T=T, H1=H1, B=b, B2=B2, twist=twist,
        F2_ZERO=F2_ZERO, F2_ONE=F2_ONE, F12_ONE=F12_ONE,
        f2_add=f2_add, f2_sub=f2_sub, f2_neg=f2_neg, f2_mul=f2_mul,
        f2_sqr=f2_sqr, f2_muls=f2_muls, f2_inv=f2_inv,
        f12_mul=f12_mul, f12_sqr=f12_sqr, f12_conj=f12_conj,
        f12_inv=f12_inv, f12_pow=f12_pow,
        G1_GEN=G1_GEN, G2_GEN=G2_GEN,
        g1_is_on_curve=g1_is_on_curve, g1_add=g1_add, g1_neg=g1_neg,
        g1_mul=g1_mul,
        g2_is_on_curve=g2_is_on_curve, g2_add=g2_add, g2_neg=g2_neg,
        g2_mul=g2_mul,
        miller_loop=miller_loop, final_exponentiation=final_exponentiation,
        pairing=pairing, pairing_check=pairing_check,
    )
