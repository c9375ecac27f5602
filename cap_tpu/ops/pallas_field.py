"""Pallas TPU kernels for the field/EC hot path.

The pure-JAX limb kernels in field_jax.py express each CIOS round as a
separate XLA op, so the [.., 17] column accumulator round-trips HBM ~200x
per multiplication — measured ~0.1 G modmul/s, hopelessly bandwidth-bound.
These kernels keep the whole multiplication (and the whole mixed EC
addition) inside one Pallas program: data is tiled limb-major
([N/128, 16, 128] so every limb slice is a native (8,128) vreg), every
accumulator column lives in registers/VMEM, and HBM sees one read of each
input and one write of each output.

Measured (one v5e, transfer-synced): kernel-only mont_mul 1.6ms @ 2^18 vs
2.4ms for the pure-JAX scan path; the fused mixed-EC MSM variant lands at
90ms vs 64ms (XLA windowed) at 2^15 — both VPU-instruction-bound at ~3000
uint32 ops per modmul.  These kernels are therefore groundwork: the default
prover path stays on the XLA kernels until the round-2 MXU limb-multiply
work changes the op-count economics (see BASELINE.md).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cap_tpu.fields.host import FQ, LIMB_BITS, LIMB_MASK, NLIMBS

BLK = 1024  # elements per program (lane axis)


def _mm_body(x, y, p_limbs, n0):
    """One Montgomery product on limb-major lists: x, y = lists of 16 [B]
    uint32 vectors -> list of 16 [B] vectors.  Fully unrolled CIOS."""
    t = [jnp.zeros_like(x[0]) for _ in range(NLIMBS + 1)]
    for i in range(NLIMBS):
        xi = x[i]
        for j in range(NLIMBS):
            prod = xi * y[j]
            t[j] = t[j] + (prod & LIMB_MASK)
            t[j + 1] = t[j + 1] + (prod >> LIMB_BITS)
        m = ((t[0] & LIMB_MASK) * n0) & LIMB_MASK
        for j in range(NLIMBS):
            pm = m * p_limbs[j]
            t[j] = t[j] + (pm & LIMB_MASK)
            t[j + 1] = t[j + 1] + (pm >> LIMB_BITS)
        carry0 = t[0] >> LIMB_BITS
        t = t[1:] + [jnp.zeros_like(t[0])]
        t[0] = t[0] + carry0
    # carry-propagate 17 columns; value < 2p < 2^255 so the top vanishes
    cols = []
    c = jnp.zeros_like(t[0])
    for j in range(NLIMBS + 1):
        v = t[j] + c
        cols.append(v & LIMB_MASK)
        c = v >> LIMB_BITS
    return _cond_sub_p(cols[:NLIMBS], p_limbs)


def _cond_sub_p(cols, p_limbs):
    out = []
    borrow = jnp.zeros_like(cols[0])
    for j in range(NLIMBS):
        d = cols[j] + jnp.uint32(1 << LIMB_BITS) - p_limbs[j] - borrow
        out.append(d & LIMB_MASK)
        borrow = jnp.uint32(1) - (d >> LIMB_BITS)
    keep = borrow == 1  # borrow -> value < p -> keep original
    return [jnp.where(keep, a, b) for a, b in zip(cols, out)]


def _add_body(a, b, p_limbs):
    cols = []
    c = jnp.zeros_like(a[0])
    for j in range(NLIMBS):
        v = a[j] + b[j] + c
        cols.append(v & LIMB_MASK)
        c = v >> LIMB_BITS
    return _cond_sub_p(cols, p_limbs)


def _sub_body(a, b, p_limbs):
    # (a + p) - b, then conditional subtract
    ap = []
    c = jnp.zeros_like(a[0])
    for j in range(NLIMBS):
        v = a[j] + p_limbs[j] + c
        ap.append(v & LIMB_MASK)
        c = v >> LIMB_BITS
    # c can be 1 (a+p can exceed 16 limbs only if >= 2^256; it's < 2^255) == 0
    out = []
    borrow = jnp.zeros_like(a[0])
    for j in range(NLIMBS):
        d = ap[j] + jnp.uint32(1 << LIMB_BITS) - b[j] - borrow
        out.append(d & LIMB_MASK)
        borrow = jnp.uint32(1) - (d >> LIMB_BITS)
    return _cond_sub_p(out, p_limbs)


GRP = 8  # sublane groups per block; a limb slice is a native (8,128) vreg


def to_limb_major(x):
    """[N, 16] -> [N//128, 16, 128] (limb slices become (8,128) vreg tiles)."""
    return x.reshape(-1, 128, NLIMBS).transpose(0, 2, 1)


def from_limb_major(a):
    return a.transpose(0, 2, 1).reshape(-1, NLIMBS)


def _load_t(ref):
    """[GRP, 16, 128] block -> list of 16 (GRP,128) vreg-shaped slices."""
    return [ref[:, j, :] for j in range(NLIMBS)]


def _store_t(ref, cols):
    for j in range(NLIMBS):
        ref[:, j, :] = cols[j]


def _field_consts(ctx):
    p_limbs = [jnp.uint32(int(v)) for v in ctx.p_np]
    n0 = jnp.uint32(ctx.n0_inv)
    return p_limbs, n0


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _mont_mul_kernel(x_ref, y_ref, o_ref, *, p_np, n0_const):
    p_limbs = [jnp.uint32(int(v)) for v in p_np]
    n0 = jnp.uint32(n0_const)
    x = _load_t(x_ref)
    y = _load_t(y_ref)
    _store_t(o_ref, _mm_body(x, y, p_limbs, n0))


def mont_mul_pallas(x, y, ctx=None):
    """Drop-in pallas mont_mul for [N, 16] uint32 arrays (N % BLK == 0).

    Transposes to limb-major [16, N] around the kernel so elements ride the
    128-lane axis (the [N,16] layout would put limbs on lanes — 8x waste and
    strided column reads that spill)."""
    from cap_tpu.ops import field_jax as fj

    ctx = ctx or fj.FR_CTX
    n = x.shape[0]
    assert n % BLK == 0 and x.shape == y.shape
    kernel = partial(_mont_mul_kernel, p_np=tuple(ctx.p_np), n0_const=ctx.n0_inv)
    spec = pl.BlockSpec((GRP, NLIMBS, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n // BLK,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n // 128, NLIMBS, 128), jnp.uint32),
    )(to_limb_major(x), to_limb_major(y))
    return from_limb_major(out)


def _ec_add_mixed_kernel(ax_ref, ay_ref, az_ref, gx_ref, gy_ref, mask_ref,
                         ox_ref, oy_ref, oz_ref, *, p_np, n0_const, b3_np):
    """Fused complete mixed EC add (RCB15 alg. 8, a=0) with per-lane select:
    lanes where mask == 0 keep the accumulator unchanged."""
    p_limbs = [jnp.uint32(int(v)) for v in p_np]
    n0 = jnp.uint32(n0_const)
    b3 = [jnp.uint32(int(v)) for v in b3_np]

    x1 = _load_t(ax_ref)
    y1 = _load_t(ay_ref)
    z1 = _load_t(az_ref)
    x2 = _load_t(gx_ref)
    y2 = _load_t(gy_ref)
    b3v = [jnp.full_like(x1[0], b) for b in b3]

    mm = lambda a, b: _mm_body(a, b, p_limbs, n0)
    ad = lambda a, b: _add_body(a, b, p_limbs)
    sb = lambda a, b: _sub_body(a, b, p_limbs)

    t0 = mm(x1, x2)
    t1 = mm(y1, y2)
    t3 = mm(ad(x2, y2), ad(x1, y1))
    t3 = sb(t3, ad(t0, t1))
    t4 = ad(mm(y2, z1), y1)
    y3 = ad(mm(x2, z1), x1)
    t0 = ad(ad(t0, t0), t0)
    t2 = mm(b3v, z1)
    z3 = ad(t1, t2)
    t1 = sb(t1, t2)
    y3 = mm(b3v, y3)
    x3 = sb(mm(t3, t1), mm(t4, y3))
    y3 = ad(mm(y3, t0), mm(t1, z3))
    z3 = ad(mm(z3, t4), mm(t0, t3))

    keep = mask_ref[:, 0, :] != 0  # (GRP, 128)
    sel = lambda new, old: [jnp.where(keep, nn, oo) for nn, oo in zip(new, old)]
    _store_t(ox_ref, sel(x3, x1))
    _store_t(oy_ref, sel(y3, y1))
    _store_t(oz_ref, sel(z3, z1))


def ec_add_mixed_pallas_tiled(acc_tiled, g_tiled, mask3):
    """Fused mixed EC add in limb-major tiled layout (all [N//128, 16, 128];
    mask3 [N//128, 1, 128]; lanes with mask 0 keep the accumulator)."""
    ax, ay, az = acc_tiled
    gx, gy = g_tiled
    n128 = ax.shape[0]
    assert n128 % GRP == 0
    from cap_tpu.ops.limbs import int_to_limbs
    from cap_tpu.ops import field_jax as fj

    b3_np = tuple(int_to_limbs(3 * 3 * FQ.mont_r % FQ.p))  # 3b in Montgomery
    ctx = fj.FQ_CTX
    kernel = partial(
        _ec_add_mixed_kernel, p_np=tuple(ctx.p_np), n0_const=ctx.n0_inv, b3_np=b3_np
    )
    spec = pl.BlockSpec((GRP, NLIMBS, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((GRP, 1, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(n128 // GRP,),
        in_specs=[spec, spec, spec, spec, spec, mspec],
        out_specs=[spec, spec, spec],
        out_shape=[jax.ShapeDtypeStruct((n128, NLIMBS, 128), jnp.uint32)] * 3,
    )(ax, ay, az, gx, gy, mask3)
    return tuple(out)


def ec_add_mixed_pallas(acc, g_affine, mask):
    """acc: (x,y,z) [N,16] projective; g_affine: (x,y) [N,16]; mask [N] uint32
    (0 -> keep acc).  Returns new (x,y,z) in [N,16] layout."""
    acc_t = tuple(to_limb_major(c) for c in acc)
    g_t = tuple(to_limb_major(c) for c in g_affine)
    out = ec_add_mixed_pallas_tiled(acc_t, g_t, mask.reshape(-1, 1, 128))
    return tuple(from_limb_major(o) for o in out)
