"""Backend-generic flat limb arithmetic (shared by XLA and Pallas paths).

Every function here operates on a field element represented as a *list of 16
uint32 arrays* (one per 16-bit limb, any common batch shape).  Because the
representation is a plain Python list of arrays, the same code runs

  * at XLA level (lists of [...]-shaped jnp arrays — one fused elementwise
    graph, no lax.scan serialization), and
  * inside Pallas kernel bodies (lists of (8,128)-vreg-shaped loads).

This replaces the scan-based CIOS in field_jax for the hot paths: the scan
version costs ~2770 VPU ops per modmul with a 16-round serial chain; the
flat form here is the same op count but fully unrolled (better ILP, no scan
bookkeeping), and the *redundant* variants below drop the trailing
conditional subtraction (values kept in [0, 2p)), which is sound for
Montgomery with R = 2^256 >> 4p (CIOS bound: out < 2p when ins < 2p).

Reference role: arkworks' asm field arithmetic (SURVEY.md §2.3, L1).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from cap_tpu.fields.host import LIMB_BITS, LIMB_MASK, NLIMBS

_MASK = np.uint32(LIMB_MASK)
_B16 = np.uint32(1 << LIMB_BITS)


def mont_mul_cols_cios(x, y, p_limbs, n0):
    """Flat CIOS Montgomery product on limb lists -> limb list in [0, 2p).

    x, y: lists of 16 uint32 arrays (values < 2p is fine).
    p_limbs: list of 16 uint32 scalars; n0 = -p^{-1} mod 2^16.
    """
    t = [None] * (NLIMBS + 1)
    for i in range(NLIMBS):
        xi = x[i]
        # accumulate xi * y
        for j in range(NLIMBS):
            prod = xi * y[j]
            lo = prod & _MASK
            hi = prod >> LIMB_BITS
            t[j] = lo if t[j] is None else t[j] + lo
            t[j + 1] = hi if t[j + 1] is None else t[j + 1] + hi
        m = ((t[0] & _MASK) * n0) & _MASK
        for j in range(NLIMBS):
            pm = m * p_limbs[j]
            t[j] = t[j] + (pm & _MASK)
            t[j + 1] = t[j + 1] + (pm >> LIMB_BITS)
        carry0 = t[0] >> LIMB_BITS
        t = t[1:] + [None]
        t[0] = t[0] + carry0
    # final carry propagation over 17 columns (top column vanishes: value < 2p)
    out = []
    c = None
    for j in range(NLIMBS):
        v = t[j] if c is None else t[j] + c
        out.append(v & _MASK)
        c = v >> LIMB_BITS
    return out


def mont_mul_cols_sep(x, y, p_limbs, n0):
    """Separated-product Montgomery multiply -> limb list in [0, 2p).

    Same op count as the CIOS form (mont_mul_cols) but a different
    dependency structure: the full 256-mul schoolbook product is computed
    first as 33 independent redundant columns (every multiply independent —
    maximal ILP), then the 16 reduction rounds run over the columns.  The
    reduction's serial chain is the same depth as CIOS, but it now overlaps
    a much larger pool of independent work for the VPU scheduler.

    Column-sum bound: each column accumulates <= 32 16-bit pieces plus one
    reduction carry < 2^21 + 2^16 << 2^32, so no intermediate overflow.
    """
    t = [None] * (2 * NLIMBS + 1)
    for i in range(NLIMBS):
        xi = x[i]
        for j in range(NLIMBS):
            prod = xi * y[j]
            lo = prod & _MASK
            hi = prod >> LIMB_BITS
            t[i + j] = lo if t[i + j] is None else t[i + j] + lo
            t[i + j + 1] = hi if t[i + j + 1] is None else t[i + j + 1] + hi
    for i in range(NLIMBS):
        m = (t[i] * n0) & _MASK
        for j in range(NLIMBS):
            pm = m * p_limbs[j]
            t[i + j] = t[i + j] + (pm & _MASK)
            t[i + j + 1] = t[i + j + 1] + (pm >> LIMB_BITS)
        # column i is now ≡ 0 mod 2^16; fold its carry into column i+1
        t[i + 1] = t[i + 1] + (t[i] >> LIMB_BITS)
    out = []
    c = None
    for j in range(NLIMBS, 2 * NLIMBS):
        v = t[j] if c is None else t[j] + c
        out.append(v & _MASK)
        c = v >> LIMB_BITS
    # top column vanishes: result < 2p < 2^256
    return out


# Variant selection (import-time: kernels trace once per process).  The two
# forms are op-count-identical but schedule differently on the VPU; the
# default is chosen by measurement on the real chip (bench.py --mode field
# compares them; see BASELINE.md).
import os as _os

if _os.environ.get("CAP_MONT", "cios") == "sep":
    mont_mul_cols = mont_mul_cols_sep
else:
    mont_mul_cols = mont_mul_cols_cios


def mont_mul2_cols(a, b, c, d, p_limbs, p2_limbs, n0):
    """Fused (a*b + c*d) with ONE Montgomery reduction -> [0, 2p).

    Both schoolbook products accumulate into shared separated columns, then
    the 16 reduction rounds run once — ~23% fewer ops than two mont_muls
    for product pairs that are summed anyway (the RCB15 EC formulas' x3/y3/
    z3 outputs are exactly such pairs).  Column bound: <= 64 16-bit pieces
    from the two products (< 2^22) + <= 32 reduction pieces (< 2^21) + one
    folded carry — far below 2^32.  The pre-cond-sub result is
    (a*b + c*d + m*p)/R < p + 8p^2/2^256 < 2.5p for BN254-sized p, so one
    cond_sub_2p restores the [0, 2p) redundant invariant.
    """
    t = [None] * (2 * NLIMBS + 1)
    for x, y in ((a, b), (c, d)):
        for i in range(NLIMBS):
            xi = x[i]
            for j in range(NLIMBS):
                prod = xi * y[j]
                lo = prod & _MASK
                hi = prod >> LIMB_BITS
                t[i + j] = lo if t[i + j] is None else t[i + j] + lo
                t[i + j + 1] = hi if t[i + j + 1] is None else t[i + j + 1] + hi
    for i in range(NLIMBS):
        m = (t[i] * n0) & _MASK
        for j in range(NLIMBS):
            pm = m * p_limbs[j]
            t[i + j] = t[i + j] + (pm & _MASK)
            t[i + j + 1] = t[i + j + 1] + (pm >> LIMB_BITS)
        t[i + 1] = t[i + 1] + (t[i] >> LIMB_BITS)
    out = []
    cc = None
    for j in range(NLIMBS, 2 * NLIMBS):
        v = t[j] if cc is None else t[j] + cc
        out.append(v & _MASK)
        cc = v >> LIMB_BITS
    return cond_sub_2p(out, p2_limbs)


def cond_sub_p(cols, p_limbs):
    """Reduce a normalized 16-limb value in [0, 2p) to [0, p)."""
    out = []
    borrow = None
    for j in range(NLIMBS):
        d = cols[j] + _B16 - p_limbs[j] - (0 if borrow is None else borrow)
        out.append(d & _MASK)
        borrow = np.uint32(1) - (d >> LIMB_BITS)
    keep = borrow == 1  # borrowed -> value < p -> keep original
    return [jnp.where(keep, a, b) for a, b in zip(cols, out)]


def cond_sub_2p(cols, p2_limbs):
    """Reduce a 16-limb value in [0, 4p) to [0, 2p) (redundant-form add)."""
    out = []
    borrow = None
    for j in range(NLIMBS):
        d = cols[j] + _B16 - p2_limbs[j] - (0 if borrow is None else borrow)
        out.append(d & _MASK)
        borrow = np.uint32(1) - (d >> LIMB_BITS)
    keep = borrow == 1
    return [jnp.where(keep, a, b) for a, b in zip(cols, out)]


def mont_mul_full(x, y, p_limbs, n0):
    """Montgomery product fully reduced to [0, p)."""
    return cond_sub_p(mont_mul_cols(x, y, p_limbs, n0), p_limbs)


def add_cols(a, b):
    """Raw limb addition with carry (result may need cond_sub)."""
    out = []
    c = None
    for j in range(NLIMBS):
        v = a[j] + b[j] if c is None else a[j] + b[j] + c
        out.append(v & _MASK)
        c = v >> LIMB_BITS
    return out


def add_mod(a, b, p_limbs):
    return cond_sub_p(add_cols(a, b), p_limbs)


def add_mod_2p(a, b, p2_limbs):
    """Redundant add: ins < 2p each -> out < 2p (one cond-sub of 2p)."""
    return cond_sub_2p(add_cols(a, b), p2_limbs)


def sub_mod(a, b, p_limbs):
    """(a - b) mod p for a, b in [0, p): a + p - b then cond-sub."""
    ap = []
    c = None
    for j in range(NLIMBS):
        v = a[j] + p_limbs[j] if c is None else a[j] + p_limbs[j] + c
        ap.append(v & _MASK)
        c = v >> LIMB_BITS
    out = []
    borrow = None
    for j in range(NLIMBS):
        d = ap[j] + _B16 - b[j] - (0 if borrow is None else borrow)
        out.append(d & _MASK)
        borrow = np.uint32(1) - (d >> LIMB_BITS)
    return cond_sub_p(out, p_limbs)


def sub_mod_2p(a, b, p2_limbs):
    """(a - b) in redundant form: ins < 2p -> out < 2p (add 2p, sub b)."""
    ap = []
    c = None
    for j in range(NLIMBS):
        v = a[j] + p2_limbs[j] if c is None else a[j] + p2_limbs[j] + c
        ap.append(v & _MASK)
        c = v >> LIMB_BITS
    out = []
    borrow = None
    for j in range(NLIMBS):
        d = ap[j] + _B16 - b[j] - (0 if borrow is None else borrow)
        out.append(d & _MASK)
        borrow = np.uint32(1) - (d >> LIMB_BITS)
    return cond_sub_2p(out, p2_limbs)


def dbl_mod_2p(a, p2_limbs):
    """2a in redundant form."""
    return add_mod_2p(a, a, p2_limbs)


def mul_small_mod_2p(a, k: int, p2_limbs):
    """k*a for tiny static k (additions chain), redundant form.

    Used for the curve constant 3b = 9 in the EC formulas: 9a = 8a + a via
    three doublings + one add — 4 limb-adds instead of a full mont_mul.
    """
    assert k >= 1
    # addition-chain by binary decomposition
    acc = None
    run = a
    kk = k
    while kk:
        if kk & 1:
            acc = run if acc is None else add_mod_2p(acc, run, p2_limbs)
        kk >>= 1
        if kk:
            run = dbl_mod_2p(run, p2_limbs)
    return acc


def select(mask, a_cols, b_cols):
    """Per-lane limb select: mask ? a : b (mask broadcastable to limb shape)."""
    return [jnp.where(mask, a, b) for a, b in zip(a_cols, b_cols)]


def is_zero_cols(cols):
    acc = cols[0]
    for c in cols[1:]:
        acc = acc | c
    return acc == 0


def field_consts(ctx):
    """(p_limbs, p2_limbs, n0) uint32 scalar lists for a FieldCtx."""
    p_limbs = [np.uint32(int(v)) for v in ctx.p_np]
    p2 = int(ctx.p_int) * 2
    p2_limbs = [np.uint32((p2 >> (LIMB_BITS * j)) & LIMB_MASK) for j in range(NLIMBS)]
    return p_limbs, p2_limbs, np.uint32(ctx.n0_inv)


def unstack(arr):
    """[..., 16] array -> list of 16 [...] arrays."""
    return [arr[..., j] for j in range(NLIMBS)]


def stack(cols):
    """list of 16 [...] arrays -> [..., 16]."""
    return jnp.stack(cols, axis=-1)


# ---------------------------------------------------------------------------
# BN254 G1 group law on limb lists (redundant [0, 2p) arithmetic throughout)
#
# Complete projective formulas (Renes–Costello–Batina 2015, a = 0, b3 = 9),
# with two op-count improvements over round 1's ec.py:
#   * mul-by-b3 (= 9) is an addition chain (4 limb-adds ~500 ops) instead of
#     a full mont_mul (~2800 ops) — saves ~2 mul-equivalents per point add;
#   * all intermediates stay in [0, 2p) (no per-op final subtraction); the
#     caller normalizes with cond_sub_p only at kernel exit / host transfer.
# ---------------------------------------------------------------------------


def ec_add_mixed_cols(x1, y1, z1, x2, y2, fc):
    """Complete mixed add (RCB15 alg. 8, a=0): (x1:y1:z1) + (x2, y2, 1).

    fc = (p_limbs, p2_limbs, n0).  All coords Montgomery limb lists < 2p.
    p2 addition keeps everything < 2p; correct for identity accumulators
    ((0:y:0) with any y ≡ nonzero) but x2,y2 must be a real affine point.

    The three output coordinates are sums of product PAIRS, computed with
    the fused one-reduction mont_mul2_cols (x3 negates one operand first) —
    3 of the formula's 11 reductions disappear.
    """
    p_limbs, p2, n0 = fc
    mm = lambda a, b: mont_mul_cols(a, b, p_limbs, n0)
    mm2 = lambda a, b, c, d: mont_mul2_cols(a, b, c, d, p_limbs, p2, n0)
    ad = lambda a, b: add_mod_2p(a, b, p2)
    sb = lambda a, b: sub_mod_2p(a, b, p2)
    b3 = lambda a: mul_small_mod_2p(a, 9, p2)

    t0 = mm(x1, x2)
    t1 = mm(y1, y2)
    t3 = mm(ad(x2, y2), ad(x1, y1))
    t3 = sb(t3, ad(t0, t1))          # x1y2 + x2y1
    t4 = ad(mm(y2, z1), y1)          # y1 + y2z1
    y3 = ad(mm(x2, z1), x1)          # x1 + x2z1
    t0 = ad(dbl_mod_2p(t0, p2), t0)  # 3*x1x2
    t2 = b3(z1)
    z3 = ad(t1, t2)
    t1 = sb(t1, t2)
    y3 = b3(y3)
    ny3 = sub_mod_2p([jnp.zeros_like(c) for c in y3], y3, p2)
    x3 = mm2(t3, t1, t4, ny3)        # t3*t1 - t4*y3
    y3 = mm2(y3, t0, t1, z3)         # y3*t0 + t1*z3
    z3 = mm2(z3, t4, t0, t3)         # z3*t4 + t0*t3
    return x3, y3, z3


def ec_add_cols(p1, p2_, fc):
    """Complete projective add (RCB15 alg. 7, a=0), redundant form.
    Output coordinates use the fused one-reduction product pairs
    (see ec_add_mixed_cols)."""
    p_limbs, p2, n0 = fc
    x1, y1, z1 = p1
    x2, y2, z2 = p2_
    mm = lambda a, b: mont_mul_cols(a, b, p_limbs, n0)
    mm2 = lambda a, b, c, d: mont_mul2_cols(a, b, c, d, p_limbs, p2, n0)
    ad = lambda a, b: add_mod_2p(a, b, p2)
    sb = lambda a, b: sub_mod_2p(a, b, p2)
    b3 = lambda a: mul_small_mod_2p(a, 9, p2)

    t0 = mm(x1, x2)
    t1 = mm(y1, y2)
    t2 = mm(z1, z2)
    t3 = mm(ad(x1, y1), ad(x2, y2))
    t3 = sb(t3, ad(t0, t1))
    t4 = mm(ad(y1, z1), ad(y2, z2))
    t4 = sb(t4, ad(t1, t2))
    x3 = mm(ad(x1, z1), ad(x2, z2))
    y3 = sb(x3, ad(t0, t2))
    t0 = ad(dbl_mod_2p(t0, p2), t0)
    t2 = b3(t2)
    z3 = ad(t1, t2)
    t1 = sb(t1, t2)
    y3 = b3(y3)
    ny3 = sub_mod_2p([jnp.zeros_like(c) for c in y3], y3, p2)
    x3 = mm2(t3, t1, t4, ny3)
    y3 = mm2(y3, t0, t1, z3)
    z3 = mm2(z3, t4, t0, t3)
    return x3, y3, z3
