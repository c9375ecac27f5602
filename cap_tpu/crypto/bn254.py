"""BN254 (alt_bn128) host arithmetic: G1, G2, and the optimal-ate pairing.

Mirrors the consumed arkworks surface (SURVEY.md §2.2 L1): G1/G2 group ops for
KZG setup and commitment bookkeeping, and the pairing for SNARK verification.
The prover's hot MSMs run on device (:mod:`cap_tpu.ops.msm`); this module is
the ground truth they are tested against.

Curve: y^2 = x^3 + 3 over Fq; G2 on the sextic twist y^2 = x^3 + 3/(9+u) over
Fq2 (u^2 = -1).  The pairing uses the single-tower representation of Fq12 as
polynomials modulo w^12 - 18*w^6 + 82 (w^6 = 9 + u), the classic approach for
alt_bn128; the Miller loop count is 6x+2 with x = 4965661367192848881.
"""

from __future__ import annotations

from dataclasses import dataclass

from cap_tpu.fields.host import BN_X, FQ, FR

P = FQ.p
CURVE_B = 3

# ---------------------------------------------------------------------------
# Fq2 : u^2 = -1
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Fq2:
    c0: int
    c1: int

    def __add__(self, o):
        return Fq2((self.c0 + o.c0) % P, (self.c1 + o.c1) % P)

    def __sub__(self, o):
        return Fq2((self.c0 - o.c0) % P, (self.c1 - o.c1) % P)

    def __mul__(self, o):
        if isinstance(o, int):
            return Fq2(self.c0 * o % P, self.c1 * o % P)
        a, b, c, d = self.c0, self.c1, o.c0, o.c1
        return Fq2((a * c - b * d) % P, (a * d + b * c) % P)

    def __neg__(self):
        return Fq2(-self.c0 % P, -self.c1 % P)

    def sq(self):
        a, b = self.c0, self.c1
        return Fq2((a + b) * (a - b) % P, 2 * a * b % P)

    def inv(self):
        a, b = self.c0, self.c1
        norm = (a * a + b * b) % P
        ninv = pow(norm, -1, P)
        return Fq2(a * ninv % P, -b * ninv % P)

    def is_zero(self):
        return self.c0 == 0 and self.c1 == 0

    def conjugate(self):
        return Fq2(self.c0, -self.c1 % P)

    def pow(self, e: int):
        result = FQ2_ONE
        base = self
        while e:
            if e & 1:
                result = result * base
            base = base.sq()
            e >>= 1
        return result


FQ2_ZERO = Fq2(0, 0)
FQ2_ONE = Fq2(1, 0)
# b' = 3 / (9 + u) for the D-type twist
TWIST_B = Fq2(9, 1).inv() * 3

# ---------------------------------------------------------------------------
# G1 (affine; None = infinity)
# ---------------------------------------------------------------------------

G1_GEN = (1, 2)


def g1_is_on_curve(pt) -> bool:
    if pt is None:
        return True
    x, y = pt
    return (y * y - x * x * x - CURVE_B) % P == 0


def g1_neg(pt):
    if pt is None:
        return None
    return (pt[0], -pt[1] % P)


def g1_add(a, b):
    if a is None:
        return b
    if b is None:
        return a
    x1, y1 = a
    x2, y2 = b
    if x1 == x2:
        if (y1 + y2) % P == 0:
            return None
        m = 3 * x1 * x1 % P * pow(2 * y1 % P, -1, P) % P
    else:
        m = (y2 - y1) * pow(x2 - x1, -1, P) % P
    x3 = (m * m - x1 - x2) % P
    y3 = (m * (x1 - x3) - y1) % P
    return (x3, y3)


def g1_double(a):
    return g1_add(a, a)


_native_g1 = None


def g1_mul(pt, k: int):
    k %= FR.p
    if pt is None or k == 0:
        return None
    global _native_g1
    if _native_g1 is None:
        try:
            from cap_tpu.utils import native

            _native_g1 = native.g1_mul if native.HAVE_NATIVE else False
        except Exception:
            _native_g1 = False
    if _native_g1 is not False:
        return _native_g1(pt, k)
    acc = None
    base = pt
    while k:
        if k & 1:
            acc = g1_add(acc, base)
        base = g1_add(base, base)
        k >>= 1
    return acc


def g1j_from_affine(pt):
    """Affine/None -> Jacobian (X, Y, Z)."""
    if pt is None:
        return (1, 1, 0)
    return (pt[0], pt[1], 1)


def g1j_to_affine(j):
    x, y, z = j
    if z == 0:
        return None
    zi = pow(z, -1, P)
    zi2 = zi * zi % P
    return (x * zi2 % P, y * zi2 % P * zi % P)


def g1j_double(j):
    x, y, z = j
    if z == 0 or y == 0:
        return (1, 1, 0) if z == 0 else g1j_double_nonzero(j)
    return g1j_double_nonzero(j)


def g1j_double_nonzero(j):
    x, y, z = j
    a = x * x % P
    b = y * y % P
    c = b * b % P
    d = 2 * ((x + b) * (x + b) % P - a - c) % P
    e = 3 * a % P
    f = e * e % P
    x3 = (f - 2 * d) % P
    y3 = (e * (d - x3) - 8 * c) % P
    z3 = 2 * y * z % P
    return (x3, y3, z3)


def g1j_add(j1, j2):
    x1, y1, z1 = j1
    x2, y2, z2 = j2
    if z1 == 0:
        return j2
    if z2 == 0:
        return j1
    z1z1 = z1 * z1 % P
    z2z2 = z2 * z2 % P
    u1 = x1 * z2z2 % P
    u2 = x2 * z1z1 % P
    s1 = y1 * z2z2 % P * z2 % P
    s2 = y2 * z1z1 % P * z1 % P
    if u1 == u2:
        if s1 != s2:
            return (1, 1, 0)
        return g1j_double(j1)
    h = (u2 - u1) % P
    i = 4 * h * h % P
    jj = h * i % P
    r = 2 * (s2 - s1) % P
    v = u1 * i % P
    x3 = (r * r - jj - 2 * v) % P
    y3 = (r * (v - x3) - 2 * s1 * jj) % P
    z3 = 2 * h % P * z1 % P * z2 % P
    return (x3, y3, z3)


def g1_msm_host(scalars, points):
    """Naive host MSM (ground truth for the device Pippenger kernels)."""
    acc = None
    for s, pt in zip(scalars, points):
        acc = g1_add(acc, g1_mul(pt, s))
    return acc


def g1_msm_pippenger(scalars, points, c: int = 8):
    """Host bucket-Pippenger MSM (arkworks VariableBaseMSM role).

    ~(254/c) * (m + 2^(c+1)) Jacobian adds — the engine behind
    CAP_MSM=host, which lets small real proofs run in the CPU test suite
    without the device MSM's table/compile overhead.  Dispatches to the
    threaded C++ Pippenger (native/cap_native.cpp) when available —
    ~25x over the Python ladder at n=2^14 — with this Python form as the
    fallback and ground truth."""
    from cap_tpu.utils import native

    r = native.g1_msm_pippenger(scalars, points)
    if r is not NotImplemented:
        return r
    windows = (254 + c - 1) // c
    mask = (1 << c) - 1
    acc = (1, 1, 0)
    for w in reversed(range(windows)):
        if acc[2] != 0:
            for _ in range(c):
                acc = g1j_double(acc)
        buckets = [None] * (mask + 1)
        for s, pt in zip(scalars, points):
            d = (s >> (w * c)) & mask
            if d and pt is not None:
                j = g1j_from_affine(pt)
                buckets[d] = j if buckets[d] is None else g1j_add(buckets[d], j)
        running = (1, 1, 0)
        winsum = (1, 1, 0)
        for d in reversed(range(1, mask + 1)):
            if buckets[d] is not None:
                running = g1j_add(running, buckets[d])
            winsum = g1j_add(winsum, running)
        acc = g1j_add(acc, winsum)
    return g1j_to_affine(acc)


# ---------------------------------------------------------------------------
# G2 (affine over Fq2; None = infinity)
# ---------------------------------------------------------------------------

G2_GEN = (
    Fq2(
        10857046999023057135944570762232829481370756359578518086990519993285655852781,
        11559732032986387107991004021392285783925812861821192530917403151452391805634,
    ),
    Fq2(
        8495653923123431417604973247489272438418190587263600148770280649306958101930,
        4082367875863433681332203403145435568316851327593401208105741076214120093531,
    ),
)


def g2_is_on_curve(pt) -> bool:
    if pt is None:
        return True
    x, y = pt
    lhs = y.sq()
    rhs = x.sq() * x + TWIST_B
    return (lhs - rhs).is_zero()


def g2_neg(pt):
    if pt is None:
        return None
    return (pt[0], -pt[1])


def g2_add(a, b):
    if a is None:
        return b
    if b is None:
        return a
    x1, y1 = a
    x2, y2 = b
    if (x1 - x2).is_zero():
        if (y1 + y2).is_zero():
            return None
        m = x1.sq() * 3 * (y1 * 2).inv()
    else:
        m = (y2 - y1) * (x2 - x1).inv()
    x3 = m.sq() - x1 - x2
    y3 = m * (x1 - x3) - y1
    return (x3, y3)


def g2_mul(pt, k: int):
    k %= FR.p
    acc = None
    base = pt
    while k:
        if k & 1:
            acc = g2_add(acc, base)
        base = g2_add(base, base)
        k >>= 1
    return acc


def g2_mul_cofactor(pt):
    """Clear the G2 cofactor (h2 = (36x^4+36x^3+30x^2+6x+1)... ) — only needed
    if untrusted G2 points were deserialized; SRS G2 points are trusted."""
    h2 = (
        21888242871839275222246405745257275088844257914179612981679871602714643921549
    )  # #E'(Fq2) / r
    return g2_mul_unreduced(pt, h2)


def g2_mul_unreduced(pt, k: int):
    acc = None
    base = pt
    while k:
        if k & 1:
            acc = g2_add(acc, base)
        base = g2_add(base, base)
        k >>= 1
    return acc


# ---------------------------------------------------------------------------
# Fq12 as Fq[w] / (w^12 - 18 w^6 + 82)
# ---------------------------------------------------------------------------

_FQ12_DEG = 12
# w^12 = 18 w^6 - 82
_RED_HI = 18
_RED_LO = -82


class Fq12:
    __slots__ = ("c",)

    def __init__(self, coeffs):
        assert len(coeffs) == _FQ12_DEG
        self.c = tuple(v % P for v in coeffs)

    @staticmethod
    def one():
        return Fq12((1,) + (0,) * 11)

    @staticmethod
    def zero():
        return Fq12((0,) * 12)

    @staticmethod
    def from_fq(v: int):
        return Fq12((v,) + (0,) * 11)

    def __eq__(self, o):
        return self.c == o.c

    def __add__(self, o):
        return Fq12([a + b for a, b in zip(self.c, o.c)])

    def __sub__(self, o):
        return Fq12([a - b for a, b in zip(self.c, o.c)])

    def __neg__(self):
        return Fq12([-a for a in self.c])

    def __mul__(self, o):
        if isinstance(o, int):
            return Fq12([a * o for a in self.c])
        a, b = self.c, o.c
        t = [0] * 23
        for i in range(12):
            ai = a[i]
            if ai:
                for j in range(12):
                    t[i + j] += ai * b[j]
        # reduce degrees 22..12 using w^12 = 18 w^6 - 82
        for d in range(22, 11, -1):
            v = t[d]
            if v:
                t[d] = 0
                t[d - 6] += 18 * v
                t[d - 12] -= 82 * v
        return Fq12(t[:12])

    def sq(self):
        return self * self

    def pow(self, e: int):
        result = Fq12.one()
        base = self
        while e:
            if e & 1:
                result = result * base
            base = base * base
            e >>= 1
        return result

    def inv(self):
        """Extended Euclid in Fq[w] modulo the reduction polynomial."""
        mod = [-_RED_LO if i == 0 else 0 for i in range(13)]
        mod[0] = 82
        mod[6] = -18
        mod[12] = 1
        lm, hm = [1] + [0] * 12, [0] * 13
        low, high = list(self.c) + [0], mod
        while _deg(low):
            r = _poly_rounded_div(high, low)
            nm = [(hm[i] - sum(lm[i - j] * r[j] for j in range(min(i + 1, len(r))) if i - j < 13)) % P for i in range(13)]
            new = [(high[i] - sum(low[i - j] * r[j] for j in range(min(i + 1, len(r))) if i - j < 13)) % P for i in range(13)]
            lm, low, hm, high = nm, new, lm, low
        c0inv = pow(low[0], -1, P)
        return Fq12([v * c0inv % P for v in lm[:12]])

    def is_one(self):
        return self.c[0] == 1 and all(v == 0 for v in self.c[1:])


def _deg(poly):
    d = len(poly) - 1
    while d and poly[d] % P == 0:
        d -= 1
    return d if poly[d] % P != 0 or d > 0 else 0


def _poly_rounded_div(a, b):
    dega, degb = _deg(a), _deg(b)
    temp = [v % P for v in a]
    binv = pow(b[degb], -1, P)
    out = [0] * (dega - degb + 1)
    for i in range(dega - degb, -1, -1):
        out[i] = (out[i] + temp[degb + i] * binv) % P
        for c in range(degb + 1):
            temp[c + i] = (temp[c + i] - out[i] * b[c]) % P
    return out


# w and helpers for the twist embedding
_W = Fq12((0, 1) + (0,) * 10)
_W2 = _W * _W
_W3 = _W2 * _W


def _fq2_to_fq12(v: Fq2) -> Fq12:
    """Embed c0 + c1*u with u = w^6 - 9."""
    coeffs = [0] * 12
    coeffs[0] = (v.c0 - 9 * v.c1) % P
    coeffs[6] = v.c1
    return Fq12(coeffs)


def twist_g2(pt):
    """Map a G2 point on the twist into E(Fq12) coordinates."""
    if pt is None:
        return None
    x, y = pt
    return (_fq2_to_fq12(x) * _W2, _fq2_to_fq12(y) * _W3)


def _cast_g1(pt):
    if pt is None:
        return None
    return (Fq12.from_fq(pt[0]), Fq12.from_fq(pt[1]))


# ---------------------------------------------------------------------------
# Miller loop + final exponentiation
# ---------------------------------------------------------------------------

ATE_LOOP_COUNT = 6 * BN_X + 2  # 29793968203157093288
_LOG_ATE = 63

# Frobenius on the twist: pi(x, y) = (x.conj * FROB_X, y.conj * FROB_Y)
_FROB_X = Fq2(9, 1).pow((P - 1) // 3)
_FROB_Y = Fq2(9, 1).pow((P - 1) // 2)


def g2_frobenius(pt):
    if pt is None:
        return None
    x, y = pt
    return (x.conjugate() * _FROB_X, y.conjugate() * _FROB_Y)


def _linefunc(p1, p2, t):
    """Evaluate the line through p1,p2 (or tangent) at point t; all in Fq12."""
    x1, y1 = p1
    x2, y2 = p2
    xt, yt = t
    if x1 != x2:
        m = (y2 - y1) * (x2 - x1).inv()
        return m * (xt - x1) - (yt - y1)
    if y1 == y2:
        m = x1.sq() * 3 * (y1 * 2).inv()
        return m * (xt - x1) - (yt - y1)
    return xt - x1


def _ec_double_fq12(pt):
    x, y = pt
    m = x.sq() * 3 * (y * 2).inv()
    nx = m.sq() - x - x
    ny = m * (x - nx) - y
    return (nx, ny)


def _ec_add_fq12(a, b):
    x1, y1 = a
    x2, y2 = b
    if x1 == x2 and y1 == y2:
        return _ec_double_fq12(a)
    m = (y2 - y1) * (x2 - x1).inv()
    nx = m.sq() - x1 - x2
    ny = m * (x1 - nx) - y1
    return (nx, ny)


def miller_loop(q, p) -> Fq12:
    """Miller loop on Q in G2 (Fq2 affine) and P in G1 (no final exp)."""
    if q is None or p is None:
        return Fq12.one()
    q_t = twist_g2(q)
    p_c = _cast_g1(p)
    r = q_t
    f = Fq12.one()
    for i in range(_LOG_ATE, -1, -1):
        f = f * f * _linefunc(r, r, p_c)
        r = _ec_double_fq12(r)
        if ATE_LOOP_COUNT & (1 << i):
            f = f * _linefunc(r, q_t, p_c)
            r = _ec_add_fq12(r, q_t)
    q1 = twist_g2(g2_frobenius(q))
    q2 = g2_frobenius(g2_frobenius(q))
    nq2 = twist_g2((q2[0], -q2[1]))
    f = f * _linefunc(r, q1, p_c)
    r = _ec_add_fq12(r, q1)
    f = f * _linefunc(r, nq2, p_c)
    return f


_FINAL_EXP = (P**12 - 1) // FR.p

# Frobenius on Fq12: f^(p^e) = sum_k c_k * (w^(p^e))^k (coefficients are in
# Fq, so they are Frobenius-fixed).  Precompute the (w^(p^e))^k tables.
_FROB_TABLES: dict = {}


def _frob_table(e: int):
    tab = _FROB_TABLES.get(e)
    if tab is None:
        we = _W.pow(pow(P, e))
        tab = [Fq12.one()]
        for _ in range(11):
            tab.append(tab[-1] * we)
        _FROB_TABLES[e] = tab
    return tab


def fq12_frobenius(f: Fq12, e: int) -> Fq12:
    tab = _frob_table(e)
    acc = Fq12.zero()
    for k in range(12):
        if f.c[k]:
            acc = acc + tab[k] * f.c[k]
    return acc


def final_exponentiate(f: Fq12) -> Fq12:
    """Fast final exponentiation: easy part + Scott et al. BN hard part.

    Self-checked against the naive f^((p^12-1)/r) in tests; the cyclotomic
    inverse after the easy part is the p^6-Frobenius (conjugation)."""
    # easy part: f^((p^6-1)(p^2+1))
    m = fq12_frobenius(f, 6) * f.inv()
    m = fq12_frobenius(m, 2) * m
    conj = lambda g: fq12_frobenius(g, 6)  # = g^{-1} in the cyclotomic subgroup
    # hard part (exponent (p^4 - p^2 + 1)/r), vectorial addition chain
    fx = m.pow(BN_X)
    fx2 = fx.pow(BN_X)
    fx3 = fx2.pow(BN_X)
    y0 = fq12_frobenius(m, 1) * fq12_frobenius(m, 2) * fq12_frobenius(m, 3)
    y1 = conj(m)
    y2 = fq12_frobenius(fx2, 2)
    y3 = conj(fq12_frobenius(fx, 1))
    y4 = conj(fx * fq12_frobenius(fx2, 1))
    y5 = conj(fx2)
    y6 = conj(fx3 * fq12_frobenius(fx3, 1))
    t0 = y6.sq() * y4 * y5
    t1 = y3 * y5 * t0
    t0 = t0 * y2
    t1 = (t1.sq() * t0).sq()
    t0 = t1 * y1
    t1 = t1 * y0
    t0 = t0.sq()
    return t0 * t1


def final_exponentiate_naive(f: Fq12) -> Fq12:
    return f.pow(_FINAL_EXP)


def pairing(q, p) -> Fq12:
    """e(P, Q) with P in G1, Q in G2 (affine tuples / None)."""
    assert g2_is_on_curve(q), "Q not on twist"
    assert g1_is_on_curve(p), "P not on curve"
    if q is None or p is None:
        return Fq12.one()
    return final_exponentiate(miller_loop(q, p))


def multi_pairing(pairs) -> Fq12:
    """Product of pairings with a single shared final exponentiation.

    `pairs` is a list of (g1_point, g2_point).  This is what batch SNARK
    verification reduces to (reference src/lib.rs:517-522 `batch_verify`).
    """
    f = Fq12.one()
    for g1p, g2p in pairs:
        if g1p is None or g2p is None:
            continue
        f = f * miller_loop(g2p, g1p)
    return final_exponentiate(f)


def pairing_check(pairs) -> bool:
    """True iff prod e(P_i, Q_i) == 1.

    Uses the native C++ multi-pairing when available (~50x: tower
    arithmetic + one shared final exponentiation); this Python path is the
    ground truth it is tested against."""
    try:
        from cap_tpu.utils import native

        got = native.pairing_check(pairs)
        if got is not None:
            return got
    except Exception:
        pass
    return multi_pairing(pairs).is_one()
