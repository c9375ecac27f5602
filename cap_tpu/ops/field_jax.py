"""Vectorized prime-field arithmetic on 16x16-bit limbs (JAX, VPU-shaped).

This is the numeric core of the prover: every NTT butterfly, MSM point add
and batched hash runs through `mont_mul` below.  The algorithm is CIOS
Montgomery multiplication with W = 2^16 limbs held in uint32 lanes:

  * limb products are 32-bit (16x16), split into lo/hi 16-bit halves and
    accumulated into per-column uint32 accumulators — a column absorbs well
    under 2^32 before the per-round shift, so no intra-round carries;
  * one reduction round per limb folds m = t0 * (-p^-1 mod 2^16) and shifts.

The 16 CIOS rounds and all carry/borrow propagations are expressed as
`lax.scan`s: the compiled graph stays tiny (compile time was the bottleneck
with fully unrolled limb loops) while the runtime schedule is identical —
rounds are data-dependent and would serialize anyway.

Everything is shape-polymorphic over leading batch dimensions: an element is
`[..., 16] uint32`; the same code runs under `vmap`, `jit`, `shard_map` and
inside Pallas kernel bodies.  Replaces the role of arkworks' x86 asm field
arithmetic (SURVEY.md §2.3) and is the roofline target for `bench.py`.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache

import jax.numpy as jnp
import numpy as np
from jax import lax

from cap_tpu.fields.host import FQ, FR, LIMB_BITS, LIMB_MASK, NLIMBS, PrimeField
from cap_tpu.ops.limbs import int_to_limbs

_U32 = jnp.uint32


@dataclass(frozen=True)
class FieldCtx:
    """Static per-field constants for the limb kernels (closure captured)."""

    name: str
    p_int: int
    n0_inv: int                    # -p^{-1} mod 2^16, static python int
    p_np: np.ndarray               # [16] uint32 modulus limbs
    r2_np: np.ndarray              # [16] uint32, R^2 mod p (Montgomery form of R)
    one_mont_np: np.ndarray        # [16] uint32, R mod p (Montgomery 1)
    one_plain_np: np.ndarray       # [16] uint32, plain 1
    field: PrimeField

    @staticmethod
    def make(field: PrimeField) -> "FieldCtx":
        return FieldCtx(
            name=field.name,
            p_int=field.p,
            n0_inv=field.n0_inv,
            p_np=int_to_limbs(field.p).astype(np.uint32),
            r2_np=int_to_limbs(field.mont_r2).astype(np.uint32),
            one_mont_np=int_to_limbs(field.mont_r).astype(np.uint32),
            one_plain_np=int_to_limbs(1).astype(np.uint32),
            field=field,
        )


@lru_cache(maxsize=None)
def ctx_for(field: PrimeField) -> FieldCtx:
    return FieldCtx.make(field)


FR_CTX = ctx_for(FR)
FQ_CTX = ctx_for(FQ)


# ---------------------------------------------------------------------------
# carry / borrow propagation (lax.scan over the limb axis)
# ---------------------------------------------------------------------------


def _carry_scan(t):
    """Normalize uint32 columns [..., K] to 16-bit limbs; returns (limbs, carry)."""
    xs = jnp.moveaxis(t, -1, 0)

    def step(c, col):
        v = col + c
        return v >> LIMB_BITS, v & LIMB_MASK

    c, ys = lax.scan(step, jnp.zeros(t.shape[:-1], _U32), xs)
    return jnp.moveaxis(ys, 0, -1), c


def _borrow_sub(x, y):
    """(x - y) over 16-bit limb arrays [..., K]; returns (diff, borrow_out)."""
    xs = jnp.moveaxis(x, -1, 0)
    ys = jnp.moveaxis(jnp.broadcast_to(y, x.shape), -1, 0)

    def step(b, xy):
        xi, yi = xy
        d = xi + jnp.uint32(1 << LIMB_BITS) - yi - b
        return jnp.uint32(1) - (d >> LIMB_BITS), d & LIMB_MASK

    b, outs = lax.scan(step, jnp.zeros(x.shape[:-1], _U32), (xs, ys))
    return jnp.moveaxis(outs, 0, -1), b


def _cond_sub_p(x, ctx: FieldCtx):
    """Reduce a normalized value in [0, 2p) to [0, p)."""
    p = jnp.asarray(ctx.p_np)
    d, borrow = _borrow_sub(x, p)
    keep = (borrow == 1)[..., None]  # borrow -> x < p -> keep x
    return jnp.where(keep, x, d)


# ---------------------------------------------------------------------------
# public ops — [..., 16] uint32 Montgomery-form arrays unless noted
# ---------------------------------------------------------------------------


def add(x, y, ctx: FieldCtx = FR_CTX):
    cols, _ = _carry_scan(x + y)  # columns < 2^17; x+y < 2p < 2^256
    return _cond_sub_p(cols, ctx)


def sub(x, y, ctx: FieldCtx = FR_CTX):
    # (x + p) - y then one conditional subtract; x + p < 2^255 fits 16 limbs
    xp, _ = _carry_scan(x + jnp.asarray(ctx.p_np))
    d, _ = _borrow_sub(xp, jnp.broadcast_to(y, xp.shape))
    return _cond_sub_p(d, ctx)


def neg(x, ctx: FieldCtx = FR_CTX):
    return sub(jnp.zeros_like(x), x, ctx)


def is_zero(x):
    return jnp.all(x == 0, axis=-1)


def _pad_hi(a):
    """[..., 16] -> [..., 17] with a zero appended (lo halves at offset 0)."""
    return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, 1)])


def _pad_lo(a):
    """[..., 16] -> [..., 17] with a zero prepended (hi halves at offset 1)."""
    return jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(1, 0)])


def mont_mul(x, y, ctx: FieldCtx = FR_CTX):
    """CIOS Montgomery product: x*y*R^{-1} mod p, Montgomery in/out."""
    bshape = jnp.broadcast_shapes(x.shape[:-1], y.shape[:-1])
    xb = jnp.broadcast_to(x, bshape + (NLIMBS,))
    yb = jnp.broadcast_to(y, bshape + (NLIMBS,))
    p_arr = jnp.asarray(ctx.p_np)
    n0 = jnp.uint32(ctx.n0_inv)
    xs = jnp.moveaxis(xb, -1, 0)  # [16, ...]

    def round_fn(t, xi):
        # t: [..., 17] column accumulators (value = sum t[j] 2^16j)
        prod = xi[..., None] * yb
        t = t + _pad_hi(prod & LIMB_MASK) + _pad_lo(prod >> LIMB_BITS)
        m = ((t[..., 0] & LIMB_MASK) * n0) & LIMB_MASK
        pm = m[..., None] * p_arr
        t = t + _pad_hi(pm & LIMB_MASK) + _pad_lo(pm >> LIMB_BITS)
        carry0 = t[..., 0] >> LIMB_BITS
        t = jnp.concatenate(
            [t[..., 1:2] + carry0[..., None], t[..., 2:], jnp.zeros_like(t[..., :1])],
            axis=-1,
        )
        return t, None

    t0 = jnp.zeros(bshape + (NLIMBS + 1,), _U32)
    t, _ = lax.scan(round_fn, t0, xs)
    # value < 2p < 2^255: after carrying 17 columns the top limb vanishes
    cols, _ = _carry_scan(t)
    return _cond_sub_p(cols[..., :NLIMBS], ctx)


def mont_sqr(x, ctx: FieldCtx = FR_CTX):
    return mont_mul(x, x, ctx)


def to_mont(x_plain, ctx: FieldCtx = FR_CTX):
    return mont_mul(x_plain, jnp.asarray(ctx.r2_np), ctx)


def from_mont(x, ctx: FieldCtx = FR_CTX):
    return mont_mul(x, jnp.asarray(ctx.one_plain_np), ctx)


def one_mont(shape=(), ctx: FieldCtx = FR_CTX):
    return jnp.broadcast_to(jnp.asarray(ctx.one_mont_np), tuple(shape) + (NLIMBS,))


def zero(shape=(), ctx: FieldCtx = FR_CTX):
    return jnp.zeros(tuple(shape) + (NLIMBS,), _U32)


def select(mask, a, b):
    """Elementwise field select: mask ? a : b (mask shape = batch shape)."""
    return jnp.where(mask[..., None], a, b)


def pow_const(x, exponent: int, ctx: FieldCtx = FR_CTX):
    """x^e for a *static* exponent via fori_loop (small compiled graph)."""
    nbits = max(exponent.bit_length(), 1)
    bits = jnp.asarray([(exponent >> i) & 1 for i in range(nbits)], dtype=jnp.bool_)
    one = one_mont(x.shape[:-1], ctx)

    def body(i, carry):
        acc, base = carry
        mask = jnp.broadcast_to(bits[i], acc.shape[:-1])
        acc = select(mask, mont_mul(acc, base, ctx), acc)
        base = mont_mul(base, base, ctx)
        return (acc, base)

    acc, _ = lax.fori_loop(0, nbits, body, (one, x))
    return acc


def inv(x, ctx: FieldCtx = FR_CTX):
    """Field inverse via Fermat (x^(p-2)); 0 maps to 0."""
    return pow_const(x, ctx.p_int - 2, ctx)


def prefix_prod(x, ctx: FieldCtx = FR_CTX, mul=None):
    """Inclusive prefix product along axis 0 (Hillis–Steele shift ladder).

    log2(n) full-array mont_muls — measured faster than
    lax.associative_scan on this stack, and ~30x cheaper than a
    full-array Fermat pow when feeding batch inversion.  `mul` overrides
    the multiply (e.g. the flat Pallas kernel on aligned shapes)."""
    mul = mul or (lambda a, b: mont_mul(a, b, ctx))
    n = x.shape[0]
    shift = 1
    while shift < n:
        pad = one_mont((shift,) + x.shape[1:-1], ctx)
        x = mul(x, jnp.concatenate([pad, x[:-shift]], axis=0))
        shift <<= 1
    return x


def suffix_prod(x, ctx: FieldCtx = FR_CTX, mul=None):
    """Inclusive suffix product along axis 0 (reverse of prefix_prod)."""
    return jnp.flip(prefix_prod(jnp.flip(x, 0), ctx, mul=mul), 0)


def suffix_sum(x, ctx: FieldCtx = FR_CTX):
    """Inclusive suffix sum along axis 0 (shift ladder of field adds).

    log2(n) full-array adds — the opening-quotient kernel's workhorse:
    (q(X) - q(z))/(X - z) has coefficients c_i = z^{-(i+1)} * S_{i+1} with
    S_i = sum_{j>=i} q_j z^j, so the whole division is one elementwise
    multiply, this adds-only ladder, and one more elementwise multiply —
    ~3n modmuls instead of the round-1 2n-point NTT + batched inversion."""
    n = x.shape[0]
    shift = 1
    while shift < n:
        pad = zero((shift,) + x.shape[1:-1], ctx)
        x = add(x, jnp.concatenate([x[shift:], pad], axis=0), ctx)
        shift <<= 1
    return x


def batch_inv_nonzero(x, ctx: FieldCtx = FR_CTX):
    """Batched inverse along axis 0 via Montgomery's trick.

    Every element must be nonzero (callers invert random-challenge-shifted
    domains or permutation denominators, which vanish only with negligible
    probability).  Two shift-ladder product sweeps + ONE scalar Fermat
    inversion replace the 508-mul full-array pow of `inv`."""
    pref = prefix_prod(x, ctx)
    suf = suffix_prod(x, ctx)
    total_inv = inv(pref[-1:], ctx)
    left = jnp.concatenate([one_mont((1,) + x.shape[1:-1], ctx), pref[:-1]], axis=0)
    right = jnp.concatenate([suf[1:], one_mont((1,) + x.shape[1:-1], ctx)], axis=0)
    return mont_mul(mont_mul(left, right, ctx), total_inv, ctx)


def field_sum(x, ctx: FieldCtx = FR_CTX, axis: int = -2):
    """Sum field elements along `axis` by log-depth pairwise halving."""
    x = jnp.moveaxis(x, axis, 0)
    m = x.shape[0]
    target = 1
    while target < m:
        target <<= 1
    if target != m:
        pad = jnp.zeros((target - m,) + x.shape[1:], x.dtype)
        x = jnp.concatenate([x, pad], axis=0)
    while x.shape[0] > 1:
        half = x.shape[0] // 2
        x = add(x[:half], x[half:], ctx)
    return x[0]


def batch_to_host(arr, ctx: FieldCtx = FR_CTX, mont: bool = True):
    """Device limb array -> list of python ints (test helper)."""
    from cap_tpu.ops.limbs import limbs_to_ints

    return limbs_to_ints(np.asarray(arr), ctx.field if mont else None)
