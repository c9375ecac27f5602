"""Radix-12 signed-column lazy arithmetic for the EC hot kernels.

The 16x16-bit CIOS multiply (limb_kernels.mont_mul_cols) pays 2 split ops
(`& mask`, `>> 16`) plus 2 accumulate-adds for every one of its 512 u32
multiplies, because a 16x16 product fills the full u32.  With **12-bit
limbs (22 per 254-bit element) in SIGNED int32 columns**:

  * a limb product is < 2^26, so whole i32 products accumulate into
    redundant columns with no lo/hi splitting at all —
    per round: 22 mul + 22 add (x_i*y) + 22 mul + 22 add (m*p) + 4 ops,
    ~2100 ops/modmul vs ~2770 for 16-bit CIOS, in a mul:add 1:1 mix;
  * signed columns make subtraction a plain 22-limb `-` with NO borrow
    chain and NO added multiple of p (values may go negative; Montgomery
    reduction is sign-agnostic: `& mask` / arithmetic `>>` are exact in
    two's complement);
  * addition is a plain 22-limb `+` with no carry chain.

Montgomery radix here is R12 = 2^264 (22 * 12 bits), NOT the 16-bit
kernels' 2^256 — users of these kernels run a mont-264 domain end to end
and convert at the pipeline boundary (one batched 16-bit mont_mul by a
power-of-two constant each way; see ops/msm_signed.py).

Limb growth is tracked STATICALLY per limb: every value carries a list of
per-limb |limb| bounds; `mont_mul12` asserts the worst-case column
accumulation fits int32 at trace time, and `resplit12` (one masked-carry
pass, ~3 ops/limb, parallel across limbs) shrinks bounds where the
tracker demands it.  The top limb is never masked (its outgoing carry has
nowhere to go), only accumulated — its bound grows slowly and the
exit path's full carry propagation absorbs it.

Reference role: arkworks asm field mul (SURVEY.md §2.3 L1 / BASELINE.md
round-2 lever 1; measured against the 16-bit CIOS kernels in
scripts/probe_limb12.py / probe_ec_variants.py).
"""

from __future__ import annotations

import numpy as np

from cap_tpu.fields.host import LIMB_BITS, NLIMBS

B12 = 12
N12 = 22                      # ceil(264 / 12); R12 = 2^264
MASK12 = np.int32((1 << B12) - 1)
I32_MAX = (1 << 31) - 1

# resplit operands down to this per-limb bound before multiplying
_MM_SAFE = 1 << 13


class V12:
    """A field value: 22 signed-i32 limb arrays + static per-limb bounds."""

    __slots__ = ("cols", "bounds")

    def __init__(self, cols, bounds):
        assert len(cols) == N12 and len(bounds) == N12
        assert all(b <= I32_MAX for b in bounds), max(bounds)
        self.cols = cols
        self.bounds = [int(b) for b in bounds]


def consts12(ctx):
    """(p12 limbs, n0_12) for a FieldCtx modulus (as np.int32 scalars)."""
    p = int(ctx.p_int)
    p12 = [np.int32((p >> (B12 * j)) & int(MASK12)) for j in range(N12)]
    n0 = np.int32((-pow(p, -1, 1 << B12)) % (1 << B12))
    return p12, n0


def from16(cols16) -> V12:
    """16 canonical 16-bit u32 limb arrays -> V12 (12-bit signed limbs).

    External values are < 2^256; limb 21 (bits 252..264) is < 2^4 for
    values < 2p < 2^255."""
    out = []
    for j in range(N12):
        bit = B12 * j
        a, s = bit // LIMB_BITS, bit % LIMB_BITS
        v = cols16[a] >> np.uint32(s)
        if s > LIMB_BITS - B12 and a + 1 < NLIMBS:
            v = v | (cols16[a + 1] << np.uint32(LIMB_BITS - s))
        out.append((v & np.uint32(int(MASK12))).astype(np.int32))
    return V12(out, [int(MASK12)] * (N12 - 1) + [15])


def _to16_from_canonical(cols12):
    """22 canonical 12-bit limb arrays (values in [0, 2^12)) -> 16 u32 limbs."""
    u = [c.astype(np.uint32) for c in cols12]
    out = []
    for j in range(NLIMBS):
        bit = LIMB_BITS * j
        a, s = bit // B12, bit % B12
        w = u[a] >> np.uint32(s)
        got = B12 - s
        while got < LIMB_BITS and a + 1 < N12:
            a += 1
            w = w | (u[a] << np.uint32(got))
            got += B12
        out.append(w & np.uint32((1 << LIMB_BITS) - 1))
    return out


def add12(a: V12, b: V12) -> V12:
    return V12(
        [x + y for x, y in zip(a.cols, b.cols)],
        [x + y for x, y in zip(a.bounds, b.bounds)],
    )


def sub12(a: V12, b: V12) -> V12:
    return V12(
        [x - y for x, y in zip(a.cols, b.cols)],
        [x + y for x, y in zip(a.bounds, b.bounds)],
    )


def mul_small12(a: V12, k: int) -> V12:
    ku = np.int32(k)
    return V12([x * ku for x in a.cols], [b * k for b in a.bounds])


def resplit12(a: V12) -> V12:
    """One masked-carry pass: limb_j := (a_j & fff) + (a_{j-1} >> 12) for
    j < 21; the top limb is left unmasked (+= carry only), so the value is
    preserved exactly for ANY signed input.  Parallel across limbs."""
    out = [a.cols[0] & MASK12]
    nb = [int(MASK12)]
    for j in range(1, N12 - 1):
        out.append((a.cols[j] & MASK12) + (a.cols[j - 1] >> B12))
        nb.append(int(MASK12) + (a.bounds[j - 1] >> B12) + 1)
    out.append(a.cols[N12 - 1] + (a.cols[N12 - 2] >> B12))
    nb.append(a.bounds[N12 - 1] + (a.bounds[N12 - 2] >> B12) + 1)
    return V12(out, nb)


def fit_for_mm(a: V12) -> V12:
    while max(a.bounds) > _MM_SAFE:
        a = resplit12(a)
    return a


def mont_mul12(x: V12, y: V12, p12, n0) -> V12:
    """Radix-2^12 Montgomery product over signed columns (R12 = 2^264).

    Output: limbs ~2^12-bounded (two resplit passes); value in (-p, 2p)
    whenever |x_val * y_val| < 2^264 * p (huge slack for all callers).
    Per-column overflow bounds are tracked through the trace and asserted.
    """
    x = fit_for_mm(x)
    y = fit_for_mm(y)

    zero = np.int32(0)
    t = [None] * N12
    tb = [0] * N12
    for i in range(N12):
        xi = x.cols[i]
        xb = x.bounds[i]
        for j in range(N12):
            prod = xi * y.cols[j]
            pb = xb * y.bounds[j]
            assert pb <= I32_MAX, (i, j, pb)
            t[j] = prod if t[j] is None else t[j] + prod
            tb[j] += pb
        m = ((t[0] & MASK12) * n0) & MASK12
        for j in range(N12):
            t[j] = t[j] + m * p12[j]
            tb[j] += int(MASK12) * int(p12[j])
        carry = t[0] >> B12
        cb = (tb[0] >> B12) + 1
        t = t[1:] + [None]
        tb = tb[1:] + [0]
        t[0] = t[0] + carry
        tb[0] += cb
        t[-1] = xi * zero  # fresh zero column (same shape/dtype)
        assert max(tb) <= I32_MAX, max(tb)
    out = V12(t, tb)
    out = resplit12(resplit12(out))
    return out


def _cond_sub12(cols, d_limbs):
    """Canonical 12-bit limbs: subtract d if value >= d (borrow chain)."""
    import jax.numpy as jnp

    sub = []
    borrow = None
    B = np.int32(1 << B12)
    for j in range(N12):
        d = cols[j] + B - d_limbs[j] - (np.int32(0) if borrow is None else borrow)
        sub.append(d & MASK12)
        borrow = np.int32(1) - (d >> B12)
    keep = borrow == 1  # borrowed -> value < d -> keep the un-subtracted form
    return [jnp.where(keep, o, s) for o, s in zip(cols, sub)]


def to16_exit(a: V12, ctx_p: int):
    """Signed redundant value -> [0, 2p) canonical 16-bit external limbs.

    Caller guarantees value in (-3p, 4p) (EC outputs are sums/differences
    of two mont_mul12 results, each in (-p, 2p)).  Adds 4p, carry-
    propagates (value then in (p, 8p) < 2^264, canonical limbs), and
    conditionally subtracts 4p then 2p -> [0, 2p), the external
    redundant-form contract.
    """
    p4 = [np.int32(((4 * ctx_p) >> (B12 * j)) & int(MASK12)) for j in range(N12)]
    p2 = [np.int32(((2 * ctx_p) >> (B12 * j)) & int(MASK12)) for j in range(N12)]
    cols = [a.cols[j] + p4[j] for j in range(N12)]
    out = []
    c = None
    for j in range(N12):
        v = cols[j] if c is None else cols[j] + c
        out.append(v & MASK12)
        c = v >> B12
    out = _cond_sub12(out, p4)
    out = _cond_sub12(out, p2)
    return _to16_from_canonical(out)


# ---------------------------------------------------------------------------
# BN254 G1 group law on V12 (RCB15 complete formulas, a = 0, b3 = 9)
# ---------------------------------------------------------------------------


def ec_add_mixed12(x1, y1, z1, x2, y2, p12, n0):
    """Complete mixed add on V12 values (mont-264 domain coordinates)."""
    mm = lambda a, b: mont_mul12(a, b, p12, n0)

    t0 = mm(x1, x2)
    t1 = mm(y1, y2)
    t3 = mm(add12(x2, y2), add12(x1, y1))
    t3 = sub12(t3, add12(t0, t1))
    t4 = add12(mm(y2, z1), y1)
    y3 = add12(mm(x2, z1), x1)
    t0 = mul_small12(t0, 3)
    t2 = mul_small12(z1, 9)
    z3 = add12(t1, t2)
    t1 = sub12(t1, t2)
    y3 = mul_small12(y3, 9)
    x3 = sub12(mm(t3, t1), mm(t4, y3))
    y3 = add12(mm(y3, t0), mm(t1, z3))
    z3 = add12(mm(z3, t4), mm(t0, t3))
    return x3, y3, z3


def ec_add12(p1, p2_, p12, n0):
    """Complete projective add on V12 triples (mont-264 domain)."""
    mm = lambda a, b: mont_mul12(a, b, p12, n0)
    x1, y1, z1 = p1
    x2, y2, z2 = p2_

    t0 = mm(x1, x2)
    t1 = mm(y1, y2)
    t2 = mm(z1, z2)
    t3 = mm(add12(x1, y1), add12(x2, y2))
    t3 = sub12(t3, add12(t0, t1))
    t4 = mm(add12(y1, z1), add12(y2, z2))
    t4 = sub12(t4, add12(t1, t2))
    x3 = mm(add12(x1, z1), add12(x2, z2))
    y3 = sub12(x3, add12(t0, t2))
    t0 = mul_small12(t0, 3)
    t2 = mul_small12(t2, 9)
    z3 = add12(t1, t2)
    t1 = sub12(t1, t2)
    y3 = mul_small12(y3, 9)
    x3 = sub12(mm(t3, t1), mm(t4, y3))
    y3 = add12(mm(y3, t0), mm(t1, z3))
    z3 = add12(mm(z3, t4), mm(t0, t3))
    return x3, y3, z3
