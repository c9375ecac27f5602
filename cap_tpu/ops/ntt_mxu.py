"""MXU-based NTT: four-step factorization with int8 big-int matmuls.

The radix-2 NTT keeps every butterfly multiply on the VPU (~1 T u32 ops/s
measured ceiling) and falls off the VMEM cliff past 2^17.  This module maps
the NTT's multiply mass onto the MXU instead (394 int8 TOPS on v5e):

  n = a*b, index i = i1*b + i2, k = k1 + a*k2:
    X(k) = sum_{i2} w^{i2*k1} (w^a)^{i2*k2} [ sum_{i1} (w^b)^{i1*k1} x_i ]
  step 1:  Z  = Wa @ Xm            (size-a DFTs, contraction on MXU)
  step 2:  Z' = Z  .* T            (elementwise Montgomery twiddles, VPU)
  step 3:  XO^T = Wb' @ Z'^T       (size-b DFTs on MXU); out = XO^T.reshape

Big-int matmul over Z_p: operands decompose into 37 unsigned 7-bit planes
(int8-safe, products 14-bit, int32 accumulation exact up to contraction
2^10 * 37 pairs < 2^31), giving 73 weighted int32 columns per output
element; a carry-chain + one small fold-matmul + two top-folds reduce the
~520-bit column value back to a canonical 16x16-bit limb element.  The DFT
matrices are PLAIN (non-Montgomery) so Montgomery form passes through the
contraction unchanged; coset shifts, n^-1, and output coset scalings fold
into the static Wa/Wb/T tables.

Everything here is ordinary jnp (runs on CPU for tests; XLA lowers the
int8 dots to the MXU on TPU).  Reference role: the FFT half of arkworks'
poly stack inside jf-plonk (SURVEY.md §2.2 L1, §7 Stage 4).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from cap_tpu.fields.host import FR, LIMB_BITS, NLIMBS, PrimeField
from cap_tpu.ops import field_jax as fj
from cap_tpu.ops.limbs import ints_to_limbs

NPLANES = 37          # ceil(256 / 7)
NCOLS = 2 * NPLANES - 1


def _split7(v: int) -> list[int]:
    return [(v >> (7 * k)) & 127 for k in range(NPLANES)]


def to_planes7(x):
    """[..., 16] u32 16-bit limbs -> [37, ...] int8 unsigned 7-bit digits."""
    ext = jnp.concatenate(
        [x, jnp.zeros(x.shape[:-1] + (1,), jnp.uint32)], axis=-1
    )
    digs = []
    for k in range(NPLANES):
        bit = 7 * k
        li, sh = bit // LIMB_BITS, bit % LIMB_BITS
        raw = ext[..., li] >> sh
        if sh > LIMB_BITS - 7:
            raw = raw | (ext[..., li + 1] << (LIMB_BITS - sh))
        digs.append((raw & jnp.uint32(127)).astype(jnp.int8))
    return jnp.stack(digs, axis=0)


@lru_cache(maxsize=None)
def _fold_tables(field: PrimeField):
    """Static reduction tables for cols7_to_modp."""
    p = field.p
    # FOLD7[j, v]: 7-bit planes of 2^(7*(37+j)) mod p, j in [0, 44)
    fold = np.zeros((44, NPLANES), np.int8)
    for j in range(44):
        for v, d in enumerate(_split7(pow(2, 7 * (NPLANES + j), p))):
            fold[j, v] = d
    # per-overflow-limb fold constants: for high limb h (weight 2^(256+16h))
    # split t = t_lo + 128*t_hi, so rA = 2^(256+16h) mod p and
    # rB = 2^(263+16h) mod p keep every product within int32
    rtabs = []
    for h in range(6):
        ra = pow(2, 256 + 16 * h, p)
        rb = pow(2, 263 + 16 * h, p)
        rtabs.append((
            [int((ra >> (16 * j)) & 0xFFFF) for j in range(NLIMBS)], ra,
            [int((rb >> (16 * j)) & 0xFFFF) for j in range(NLIMBS)], rb,
        ))
    # NOTE: numpy, not jnp — this is lru_cached and may first run inside a
    # trace; caching a trace-time jnp constant leaks the tracer.
    return fold, rtabs


def _carry7(cols, bound: int):
    """int32 column arrays (weights 2^(7u), >= 0, each < `bound`) -> 7-bit
    digit arrays.  Returns (digits, per-digit bound list)."""
    digs = []
    carry_b = 0
    carry = None
    for c in cols:
        v = c if carry is None else c + carry
        digs.append(v & 127)
        carry = v >> 7
        carry_b = (bound - 1 + carry_b) >> 7
    while carry_b > 0:
        digs.append(carry & 127)
        carry = carry >> 7
        carry_b >>= 7
    return digs


def _carry16(limbs, bounds):
    """16-bit-limb carry with python-side bound tracking; extends length
    until the tracked carry drains.  Returns (limbs, value_bound)."""
    total = sum(b << (16 * i) for i, b in enumerate(bounds))
    out = []
    c = None
    cb = 0
    n = len(limbs)
    i = 0
    while i < n or cb > 0:
        v = limbs[i] if i < n else None
        if v is None:
            v = c
        elif c is not None:
            v = v + c
        out.append(v & 0xFFFF)
        c = v >> 16
        cb = ((bounds[i] if i < n else 0) + cb) >> 16
        i += 1
    return out, total


def cols7_to_modp(cols, field: PrimeField = FR, col_bound: int = 1 << 30):
    """[73, ...] int32 columns (weights 2^(7u), each in [0, col_bound)) ->
    [..., 16] u32 canonical limbs of the value mod p.

    Pure carry-chains + one small int8 fold-matmul + bound-tracked top
    folds; every loop unrolls at trace time with python-int bound
    arithmetic, so the emitted graph is branch-free and provably exact.
    """
    p = field.p
    fold7, rtabs = _fold_tables(field)
    cols = [cols[u].astype(jnp.int32) for u in range(cols.shape[0])]
    digs = _carry7(cols, col_bound)
    low, high = digs[:NPLANES], digs[NPLANES:]
    # fold digits with weight >= 2^(7*37) via one tiny int8 matmul
    nh = len(high)
    assert nh <= 44, nh
    hstack = jnp.stack([h.astype(jnp.int8) for h in high], axis=-1)
    folded = jax.lax.dot_general(
        hstack, fold7[:nh], (((hstack.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [..., 37], < nh * 127^2
    cols2 = [low[v] + folded[..., v] for v in range(NPLANES)]
    digs2 = _carry7(cols2, 127 + nh * 127 * 127)

    # recombine 7-bit digits into 16-bit limb accumulators (python-bounded)
    nlim = (7 * len(digs2) + 15) // 16 + 1
    acc = [None] * nlim
    acc_b = [0] * nlim

    def put(arr, maxv, bitpos):
        li, sh = bitpos // 16, bitpos % 16
        lo = (arr << sh) & 0xFFFF
        hi = (arr << sh) >> 16
        acc[li] = lo if acc[li] is None else acc[li] + lo
        acc_b[li] += min(maxv << sh, 0xFFFF)
        acc[li + 1] = hi if acc[li + 1] is None else acc[li + 1] + hi
        acc_b[li + 1] += (maxv << sh) >> 16

    for mu, d in enumerate(digs2):
        put(d, 127, 7 * mu)
    zeros = jnp.zeros_like(digs2[0])
    acc = [a if a is not None else zeros for a in acc]
    limbs, vbound = _carry16(acc, acc_b)

    # top folds: replace each overflow limb t*2^(256+16h) by its mod-p
    # equivalent until value < 2^256 + 2p; the loop unrolls at trace time
    # driven by an exact python-int value bound (converges ~2 bits/pass
    # since 2^256 mod p < 0.4p for BN254-sized fields).
    while vbound >= (1 << 256) + 2 * p:
        high = limbs[NLIMBS:]
        assert len(high) <= len(rtabs), len(high)
        nl = list(limbs[:NLIMBS])
        nb = [0xFFFF] * NLIMBS
        vb_new = (1 << 256) - 1
        for h, t in enumerate(high):
            ra, ra_v, rb, rb_v = rtabs[h]
            t_max = min(0xFFFF, vbound >> (256 + 16 * h))
            t_lo = t & 127
            t_hi = t >> 7
            for j in range(NLIMBS):
                nl[j] = nl[j] + t_lo * ra[j] + t_hi * rb[j]
                nb[j] += 127 * ra[j] + (t_max >> 7) * rb[j]
            vb_new += min(t_max, 127) * ra_v + (t_max >> 7) * rb_v
        limbs, _ = _carry16(nl, nb)
        vbound = vb_new

    # one last fold if a single top bit remains (t <= 1): value -> < 2^256+p
    if vbound >= (1 << 256) and len(limbs) > NLIMBS:
        ra, ra_v, _, _ = rtabs[0]
        t = limbs[NLIMBS]
        nl = [limbs[j] + t * ra[j] for j in range(NLIMBS)]
        limbs, _ = _carry16(nl, [0xFFFF + ra_v for _ in range(NLIMBS)])
        vbound = (1 << 256) - 1 + ra_v

    # conditional subtracts of 2^k * p down to [0, p)
    k = 0
    while (p << (k + 1)) < vbound:
        k += 1
    limbs = (limbs + [zeros] * (NLIMBS + 1))[: NLIMBS + 1]
    while k >= 0:
        pk = p << k
        pk_l = [(pk >> (16 * j)) & 0xFFFF for j in range(NLIMBS + 1)]
        out = []
        borrow = None
        for j in range(NLIMBS + 1):
            d = limbs[j] + (1 << 16) - pk_l[j] - (0 if borrow is None else borrow)
            out.append(d & 0xFFFF)
            borrow = 1 - (d >> 16)
        keep = borrow == 1
        limbs = [jnp.where(keep, a, b) for a, b in zip(limbs, out)]
        k -= 1
    return jnp.stack(limbs[:NLIMBS], axis=-1).astype(jnp.uint32)


def matmul_zp(w7, x, field: PrimeField = FR):
    """Z_p matrix product (W @ X) via int8 MXU plane products.

    w7: [37, r, c] int8 planes of a PLAIN matrix W (entries < p).
    x:  [c, m, 16] u32 limb elements (any form < 2^256; Montgomery passes
        through).  Returns [r, m, 16] u32 canonical.
    """
    c, m = x.shape[0], x.shape[1]
    r = w7.shape[1]
    x7 = to_planes7(x)  # [37, c, m]
    x7cat = jnp.moveaxis(x7, 0, 1).reshape(c, NPLANES * m)
    ctot = jnp.zeros((NCOLS, r, m), jnp.int32)
    for s in range(NPLANES):
        prod = jax.lax.dot_general(
            w7[s], x7cat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [r, 37m]
        prod = jnp.moveaxis(prod.reshape(r, NPLANES, m), 1, 0)
        ctot = ctot.at[s : s + NPLANES].add(prod)
    return cols7_to_modp(ctot, field)


def _plain_planes(mat: np.ndarray, p: int) -> jnp.ndarray:
    """[r, c] python-int matrix -> [37, r, c] int8 7-bit planes."""
    r, c = mat.shape
    flat = ints_to_limbs([int(v) % p for v in mat.reshape(-1)])  # raw limbs
    planes = to_planes7(jnp.asarray(flat))  # [37, r*c]
    return jnp.asarray(np.asarray(planes).reshape(NPLANES, r, c))


def _factor(n: int) -> tuple[int, int]:
    """n = a*b with a, b powers of two, a >= b, both <= 2^10."""
    logn = n.bit_length() - 1
    la = (logn + 1) // 2
    return 1 << la, 1 << (logn - la)


@dataclass(frozen=True)
class MxuNttTables:
    n: int
    a: int
    b: int
    wa7: jnp.ndarray   # [37, a, a] int8
    wb7: jnp.ndarray   # [37, b, b] int8
    tw: jnp.ndarray    # [a, b, 16] u32 Montgomery twiddles


# Registered as a pytree so table sets thread through jit as ARGUMENTS:
# this runtime embeds closed-over device arrays into the remote-compile
# payload, and big-domain tables would exceed its request size limit.
jax.tree_util.register_pytree_node(
    MxuNttTables,
    lambda t: ((t.wa7, t.wb7, t.tw), (t.n, t.a, t.b)),
    lambda aux, ch: MxuNttTables(
        n=aux[0], a=aux[1], b=aux[2], wa7=ch[0], wb7=ch[1], tw=ch[2]
    ),
)


@lru_cache(maxsize=None)
def mxu_tables(n: int, field: PrimeField = FR, inverse: bool = False,
               shift: int | None = None) -> MxuNttTables:
    """Static tables for one (n, direction, coset-shift) transform.

    Forward coset: x_i pre-scaled by shift^i — g^(i1*b) folds into Wa
    columns, g^(i2) into the twiddles.  Inverse: root -> root^-1, n^-1
    folds into the twiddles; output coset scaling g^-k folds g^-k1 into
    the twiddles and g^-(a*k2) into Wb rows.
    """
    p = field.p
    a, b = _factor(n)
    w = field.root_of_unity(n)
    if inverse:
        w = pow(w, -1, p)
    wb_root = pow(w, b, p)   # order a
    wa_root = pow(w, a, p)   # order b
    g = None if shift is None else (shift % p)
    ginv = None if g is None else pow(g, -1, p)
    n_inv = pow(n, -1, p)

    wa = np.zeros((a, a), object)
    for k1 in range(a):
        base = pow(wb_root, k1, p)
        col_scale = 1
        val = 1
        for i1 in range(a):
            e = val
            if g is not None and not inverse:
                e = e * pow(g, i1 * b, p) % p
            wa[k1, i1] = e
            val = val * base % p
    # twiddles T[k1, i2] = w^(i2*k1) (* g^i2 fwd-coset) (* n_inv inverse)
    # (* g^-k1 inverse-coset)
    tw = np.zeros((a, b), object)
    for k1 in range(a):
        base = pow(w, k1, p)
        val = 1
        for i2 in range(b):
            e = val
            if g is not None and not inverse:
                e = e * pow(g, i2, p) % p
            if inverse:
                e = e * n_inv % p
                if g is not None:
                    e = e * pow(ginv, k1, p) % p
            tw[k1, i2] = e
            val = val * base % p
    wb = np.zeros((b, b), object)
    for k2 in range(b):
        base = pow(wa_root, k2, p)
        row_scale = 1 if (g is None or not inverse) else pow(ginv, a * k2, p)
        val = 1
        for i2 in range(b):
            wb[k2, i2] = val * row_scale % p
            val = val * base % p
    tw_mont = jnp.asarray(
        ints_to_limbs([int(tw[k1, i2]) for k1 in range(a) for i2 in range(b)],
                      field)
    ).reshape(a, b, NLIMBS)
    return MxuNttTables(
        n=n, a=a, b=b,
        wa7=_plain_planes(wa, p), wb7=_plain_planes(wb, p), tw=tw_mont,
    )


def _twiddle_mul(z, tw, field):
    from cap_tpu.ops import pallas_field as pfl

    ctx = fj.ctx_for(field)
    n = z.shape[0] * z.shape[1]
    flat_z = z.reshape(n, NLIMBS)
    flat_t = tw.reshape(n, NLIMBS)
    if pfl.use_pallas() and n % pfl.BLK == 0:
        out = pfl.mont_mul_pallas(flat_z, flat_t, ctx)
    else:
        out = fj.mont_mul(flat_z, flat_t, ctx)
    return out.reshape(z.shape)


def ntt_mxu(x, tables: MxuNttTables, field: PrimeField = FR):
    """[n, 16] Montgomery -> [n, 16] Montgomery via the MXU four-step.

    Natural order in, natural order out (no bit reversal anywhere)."""
    return ntt_mxu_batch(x[None], tables, field)[0]


def ntt_mxu_batch(x, tables: MxuNttTables, field: PrimeField = FR):
    """Batched transform: [k, n, 16] -> [k, n, 16] (polys share one MXU
    contraction by widening the column axis — one matmul pair for all k)."""
    k = x.shape[0]
    a, b = tables.a, tables.b
    xm = jnp.moveaxis(x.reshape(k, a, b, NLIMBS), 0, 1).reshape(a, k * b, NLIMBS)
    z = matmul_zp(tables.wa7, xm, field)            # [a, k*b, 16]
    twk = jnp.broadcast_to(
        tables.tw[:, None, :, :], (a, k, b, NLIMBS)
    ).reshape(a, k * b, NLIMBS)
    z = _twiddle_mul(z, twk, field)
    zt = jnp.transpose(z.reshape(a, k, b, NLIMBS), (2, 1, 0, 3)).reshape(
        b, k * a, NLIMBS
    )
    xot = matmul_zp(tables.wb7, zt, field)          # [b, k*a, 16] = XO^T
    out = jnp.transpose(xot.reshape(b, k, a, NLIMBS), (1, 0, 2, 3))
    return out.reshape(k, -1, NLIMBS)
