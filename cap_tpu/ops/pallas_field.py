"""Pallas TPU kernels for the field/EC hot path (round-2 flat kernels).

Design (see BASELINE.md round-2 levers and SURVEY.md §2.3):

  * data is tiled **limb-major** ([N/128, 16, 128]) so every limb slice is a
    native (8,128) vreg and the whole computation stays in registers/VMEM —
    HBM sees one read per input and one write per output;
  * arithmetic is the flat, fully-unrolled limb code from
    `cap_tpu.ops.limb_kernels` (shared with the XLA path) in **redundant
    [0, 2p) form**: no per-op conditional subtraction, and the EC constant
    3b = 9 is an addition chain instead of a full multiplication — ~1.35x
    fewer VPU ops per mixed point add than round 1;
  * kernels are small and shape-stable so Mosaic compiles are cached and
    the MSM chunk loop reuses one program.

Replaces the role of arkworks' x86 asm field arithmetic (reference
`scripts/run_benchmarks.sh:95-97`).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cap_tpu.fields.host import FQ, NLIMBS
from cap_tpu.ops import limb_kernels as lk

BLK = 1024   # elements per program (lane axis)
GRP = 8      # sublane groups per block; a limb slice is a native (8,128) vreg


def use_pallas() -> bool:
    """CAP_PALLAS=0 swaps every tiled kernel for an XLA-flat equivalent
    (same limb_kernels code, no Mosaic) — used by the CPU test suite and
    the virtual multichip dryrun where the TPU Pallas backend is absent."""
    return os.environ.get("CAP_PALLAS", "1") == "1" and jax.default_backend() == "tpu"


def _load_x(arr):
    """Tiled [M, 16, 128] -> list of 16 [M, 128] slices (XLA fallback)."""
    return [arr[:, j, :] for j in range(NLIMBS)]


def _stack_x(cols):
    return jnp.stack(cols, axis=1)


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


def _fc(ctx):
    """Static field constants tuple for limb_kernels, from a FieldCtx."""
    return lk.field_consts(ctx)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _ctx_by_name(ctx_name):
    from cap_tpu.ops import field_jax as fj

    by_name = {fj.FR_CTX.name: fj.FR_CTX, fj.FQ_CTX.name: fj.FQ_CTX}
    return by_name[ctx_name]


def _mont_mul_kernel(x_ref, y_ref, o_ref, *, ctx_name):
    p_limbs, _, n0 = _fc(_ctx_by_name(ctx_name))
    x = _load_t(x_ref)
    y = _load_t(y_ref)
    _store_t(o_ref, lk.mont_mul_full(x, y, p_limbs, n0))


def mont_mul_pallas(x, y, ctx=None):
    """Drop-in pallas mont_mul for [N, 16] uint32 arrays (N % BLK == 0)."""
    from cap_tpu.ops import field_jax as fj

    ctx = ctx or fj.FR_CTX
    n = x.shape[0]
    assert n % BLK == 0 and x.shape == y.shape
    if not use_pallas():
        from cap_tpu.ops import field_jax as fj

        return fj.mont_mul(x, y, ctx)
    kernel = partial(_mont_mul_kernel, ctx_name=ctx.name)
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
                         ox_ref, oy_ref, oz_ref):
    """Fused complete mixed EC add with per-lane select: lanes where
    mask == 0 keep the accumulator unchanged.  Coords redundant (< 2p)."""
    from cap_tpu.ops import field_jax as fj

    fc = _fc(fj.FQ_CTX)
    x1, y1, z1 = _load_t(ax_ref), _load_t(ay_ref), _load_t(az_ref)
    x2, y2 = _load_t(gx_ref), _load_t(gy_ref)
    x3, y3, z3 = lk.ec_add_mixed_cols(x1, y1, z1, x2, y2, fc)
    keep = mask_ref[:, 0, :] != 0  # (GRP, 128)
    _store_t(ox_ref, lk.select(keep, x3, x1))
    _store_t(oy_ref, lk.select(keep, y3, y1))
    _store_t(oz_ref, lk.select(keep, z3, z1))


def ec_add_mixed_pallas_tiled(acc_tiled, g_tiled, mask3):
    """Fused mixed EC add in limb-major tiled layout (all [N//128, 16, 128];
    mask3 [N//128, 1, 128]; lanes with mask 0 keep the accumulator).

    Accumulator coordinates are *redundant* (< 2p); normalize with
    `normalize_tiled` before host transfer or is-zero checks."""
    ax, ay, az = acc_tiled
    gx, gy = g_tiled
    n128 = ax.shape[0]
    if not use_pallas():
        # CPU/teaching fallback: the scan-based XLA ops (tiny compile graphs;
        # the flat unrolled code takes XLA:CPU minutes to compile)
        acc = tuple(normalize_tiled(c) for c in (ax, ay, az))
        accf = tuple(from_limb_major(c) for c in acc)
        g = (from_limb_major(gx), from_limb_major(gy))
        from cap_tpu.ops import ec as _ec

        cand = _ec.ec_add_mixed(accf, g)
        keep = mask3.reshape(-1)[:, None] != 0
        out = tuple(jnp.where(keep, cn, ac) for cn, ac in zip(cand, accf))
        return tuple(to_limb_major(c) for c in out)
    grp = _grp_for(n128)
    spec = pl.BlockSpec((grp, NLIMBS, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((grp, 1, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _ec_add_mixed_kernel,
        grid=(n128 // grp,),
        in_specs=[spec, spec, spec, spec, spec, mspec],
        out_specs=[spec, spec, spec],
        out_shape=[jax.ShapeDtypeStruct((n128, NLIMBS, 128), jnp.uint32)] * 3,
    )(ax, ay, az, gx, gy, mask3)
    return tuple(out)


import os as _os

_GRP_MAX = int(_os.environ.get("CAP_PALLAS_GRP", "8"))


def _grp_for(n128: int) -> int:
    """Largest sublane group count dividing the tile row count.

    8 rows = one (8,128) vreg per limb slice.  Wider blocks were probed for
    extra ILP against the EC kernel's serial borrow chains: grp=16 measured
    identical throughput and grp=32 overflows VMEM on the 6-operand
    projective-add kernel, so 8 stays the default."""
    for g in (_GRP_MAX, 8, 4, 2, 1):
        if g <= _GRP_MAX and n128 % g == 0:
            return g
    return 1


def _ec_add_mixed_signed_kernel(ax_ref, ay_ref, az_ref, gx_ref, gy_ref,
                                mask_ref, neg_ref, ox_ref, oy_ref, oz_ref):
    """Mixed EC add-or-subtract: lanes with neg != 0 add the NEGATED table
    point (y -> 2p - y, valid redundant since table y in (0, p)); lanes with
    mask == 0 keep the accumulator."""
    from cap_tpu.ops import field_jax as fj

    fc = _fc(fj.FQ_CTX)
    _, p2, _ = fc
    x1, y1, z1 = _load_t(ax_ref), _load_t(ay_ref), _load_t(az_ref)
    x2, y2 = _load_t(gx_ref), _load_t(gy_ref)
    negm = neg_ref[:, 0, :] != 0
    # 2p - y (no borrow chain needed per-limb? it does need one — reuse sub)
    y2n = lk.sub_mod_2p([jnp.zeros_like(c) for c in y2], y2, p2)
    y2 = lk.select(negm, y2n, y2)
    x3, y3, z3 = lk.ec_add_mixed_cols(x1, y1, z1, x2, y2, fc)
    keep = mask_ref[:, 0, :] != 0
    _store_t(ox_ref, lk.select(keep, x3, x1))
    _store_t(oy_ref, lk.select(keep, y3, y1))
    _store_t(oz_ref, lk.select(keep, z3, z1))


def ec_add_mixed_signed_pallas_tiled(acc_tiled, g_tiled, mask3, neg3):
    """Signed fused mixed EC add in limb-major tiled layout.

    mask3/neg3: [N//128, 1, 128] uint32 — mask selects active lanes, neg
    subtracts the table point instead of adding it."""
    ax, ay, az = acc_tiled
    gx, gy = g_tiled
    n128 = ax.shape[0]
    if not use_pallas():
        from cap_tpu.ops import ec as _ec, field_jax as fj

        acc = tuple(normalize_tiled(c) for c in (ax, ay, az))
        accf = tuple(from_limb_major(c) for c in acc)
        gxf, gyf = from_limb_major(gx), from_limb_major(gy)
        negm = neg3.reshape(-1)[:, None] != 0
        gyf = jnp.where(negm, fj.sub(fj.zero(gyf.shape[:-1], fj.FQ_CTX), gyf, fj.FQ_CTX), gyf)
        cand = _ec.ec_add_mixed(accf, (gxf, gyf))
        keep = mask3.reshape(-1)[:, None] != 0
        out = tuple(jnp.where(keep, cn, ac) for cn, ac in zip(cand, accf))
        return tuple(to_limb_major(c) for c in out)
    grp = _grp_for(n128)
    spec = pl.BlockSpec((grp, NLIMBS, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((grp, 1, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _ec_add_mixed_signed_kernel,
        grid=(n128 // grp,),
        in_specs=[spec, spec, spec, spec, spec, mspec, mspec],
        out_specs=[spec, spec, spec],
        out_shape=[jax.ShapeDtypeStruct((n128, NLIMBS, 128), jnp.uint32)] * 3,
    )(ax, ay, az, gx, gy, mask3, neg3)
    return tuple(out)


def _ec_add_kernel(ax_ref, ay_ref, az_ref, bx_ref, by_ref, bz_ref,
                   ox_ref, oy_ref, oz_ref):
    """Complete projective add (both operands may be identity), redundant."""
    from cap_tpu.ops import field_jax as fj

    fc = _fc(fj.FQ_CTX)
    p1 = (_load_t(ax_ref), _load_t(ay_ref), _load_t(az_ref))
    p2 = (_load_t(bx_ref), _load_t(by_ref), _load_t(bz_ref))
    x3, y3, z3 = lk.ec_add_cols(p1, p2, fc)
    _store_t(ox_ref, x3)
    _store_t(oy_ref, y3)
    _store_t(oz_ref, z3)


def ec_add_pallas_tiled(p_tiled, q_tiled):
    """Complete projective add on limb-major tiles ([M, 16, 128] each coord,
    M % GRP == 0).  Returns redundant coordinates."""
    ax, ay, az = p_tiled
    bx, by, bz = q_tiled
    n128 = ax.shape[0]
    if not use_pallas():
        from cap_tpu.ops import ec as _ec

        p1 = tuple(from_limb_major(normalize_tiled(c)) for c in (ax, ay, az))
        p2_ = tuple(from_limb_major(normalize_tiled(c)) for c in (bx, by, bz))
        out = _ec.ec_add(p1, p2_)
        return tuple(to_limb_major(c) for c in out)
    grp = _grp_for(n128)
    spec = pl.BlockSpec((grp, NLIMBS, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _ec_add_kernel,
        grid=(n128 // grp,),
        in_specs=[spec] * 6,
        out_specs=[spec, spec, spec],
        out_shape=[jax.ShapeDtypeStruct((n128, NLIMBS, 128), jnp.uint32)] * 3,
    )(ax, ay, az, bx, by, bz)
    return tuple(out)


def _normalize_kernel(x_ref, o_ref, *, ctx_name):
    p_limbs, _, _ = _fc(_ctx_by_name(ctx_name))
    _store_t(o_ref, lk.cond_sub_p(_load_t(x_ref), p_limbs))


def normalize_tiled(x_tiled, ctx=None):
    """Reduce redundant [0,2p) limb-major tiles to canonical [0,p)."""
    from cap_tpu.ops import field_jax as fj

    ctx = ctx or fj.FQ_CTX
    n128 = x_tiled.shape[0]
    if not use_pallas():
        fc = lk.field_consts(ctx)
        return _stack_x(lk.cond_sub_p(_load_x(x_tiled), fc[0]))
    grp = _grp_for(n128)
    spec = pl.BlockSpec((grp, NLIMBS, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_normalize_kernel, ctx_name=ctx.name),
        grid=(n128 // grp,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n128, NLIMBS, 128), jnp.uint32),
    )(x_tiled)


def _butterfly_kernel(u_ref, v_ref, t_ref, a_ref, b_ref, *, ctx_name):
    p_limbs, p2, n0 = _fc(_ctx_by_name(ctx_name))
    u = _load_t(u_ref)
    t = lk.mont_mul_cols(_load_t(v_ref), _load_t(t_ref), p_limbs, n0)
    _store_t(a_ref, lk.add_mod_2p(u, t, p2))
    _store_t(b_ref, lk.sub_mod_2p(u, t, p2))


def butterfly_pallas(u, v, twf, ctx=None):
    """Fused NTT butterfly: (u + v*tw, u - v*tw) on [n2, 16] uint32 arrays.

    Inputs may be redundant (< 2p); outputs are redundant — stages compose
    without normalization, callers run one `normalize_elem` pass at the end.
    One kernel per stage instead of a scan-CIOS multiply plus separate
    XLA add/sub (each of which round-tripped [n,17] accumulators)."""
    from cap_tpu.ops import field_jax as fj

    ctx = ctx or fj.FR_CTX
    n2 = u.shape[0]
    n128 = n2 // 128
    grp = _grp_for(n128)
    spec = pl.BlockSpec((grp, NLIMBS, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    a, b = pl.pallas_call(
        partial(_butterfly_kernel, ctx_name=ctx.name),
        grid=(n128 // grp,),
        in_specs=[spec, spec, spec],
        out_specs=[spec, spec],
        out_shape=[jax.ShapeDtypeStruct((n128, NLIMBS, 128), jnp.uint32)] * 2,
    )(to_limb_major(u), to_limb_major(v), to_limb_major(twf))
    return from_limb_major(a), from_limb_major(b)


def normalize_elem(x, ctx=None):
    """Reduce redundant [n, 16] element-major values to canonical [0, p)."""
    return from_limb_major(normalize_tiled(to_limb_major(x), ctx))


def _horner_fold_kernel(tx_ref, ty_ref, tz_ref, ox_ref, oy_ref, oz_ref,
                        *, nwin, wbits):
    """Cross-window Horner fold: acc = 2^wbits * acc + T_w, MSB first.

    Inputs [nwin, 16, 128] per coordinate (windows on axis 0, polys in
    lanes, canonical projective).  Runs the whole ~(nwin*wbits) doubling
    chain in ONE kernel — the XLA scan equivalent pays ~2-5 us of schedule
    overhead per tiny EC op, the host equivalent a ~29 ms transfer."""
    from jax import lax

    from cap_tpu.ops import field_jax as fj

    fc = _fc(fj.FQ_CTX)

    def getw(ref, w):
        return ref[pl.dslice(w, 1), :, :][0]

    def cols(a):
        return [a[j : j + 1, :] for j in range(NLIMBS)]

    def stackc(cs):
        return jnp.concatenate(cs, axis=0)

    def add(a, b):
        rx, ry, rz = lk.ec_add_cols(
            (cols(a[0]), cols(a[1]), cols(a[2])),
            (cols(b[0]), cols(b[1]), cols(b[2])), fc
        )
        return (stackc(rx), stackc(ry), stackc(rz))

    acc = (getw(tx_ref, nwin - 1), getw(ty_ref, nwin - 1), getw(tz_ref, nwin - 1))

    def body(i, acc):
        acc = lax.fori_loop(0, wbits, lambda _, a: add(a, a), acc)
        w = nwin - 2 - i
        g = (getw(tx_ref, w), getw(ty_ref, w), getw(tz_ref, w))
        return add(acc, g)

    ax, ay, az = lax.fori_loop(0, nwin - 1, body, acc)
    ox_ref[:] = stackc(lk.cond_sub_p(cols(ax), fc[0]))
    oy_ref[:] = stackc(lk.cond_sub_p(cols(ay), fc[0]))
    oz_ref[:] = stackc(lk.cond_sub_p(cols(az), fc[0]))


def horner_fold_pallas(t_win, nwin: int, wbits: int):
    """[nwin, 16, 128] x3 canonical window sums -> [16, 128] x3 canonical
    projective results (lane l = poly l's commitment)."""
    tx, ty, tz = t_win
    if not use_pallas():
        from jax import lax

        from cap_tpu.ops import ec as _ec

        t = tuple(jnp.moveaxis(c, 1, 2) for c in (tx, ty, tz))  # [nwin,128,16]
        acc = tuple(c[nwin - 1] for c in t)

        def body(i, acc):
            acc = lax.fori_loop(0, wbits, lambda _, a: _ec.ec_add(a, a), acc)
            g = tuple(
                jax.lax.dynamic_index_in_dim(c, nwin - 2 - i, axis=0, keepdims=False)
                for c in t
            )
            return _ec.ec_add(acc, g)

        out = lax.fori_loop(0, nwin - 1, body, acc)
        return tuple(jnp.moveaxis(c, 0, 1) for c in out)  # [16,128]
    spec = pl.BlockSpec((nwin, NLIMBS, 128), lambda: (0, 0, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((NLIMBS, 128), lambda: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_horner_fold_kernel, nwin=nwin, wbits=wbits),
        in_specs=[spec, spec, spec],
        out_specs=[ospec, ospec, ospec],
        out_shape=[jax.ShapeDtypeStruct((NLIMBS, 128), jnp.uint32)] * 3,
    )(tx, ty, tz)
    return tuple(out)


# ---------------------------------------------------------------------------
# fused prefix product (grand-product ladder, round-4 lever 3)
# ---------------------------------------------------------------------------


def _lane_prefix_kernel(x_ref, o_ref, carry_ref, *, ctx_name, blk):
    """Per-lane inclusive prefix product along the sublane axis with a
    cross-grid-step running-product carry.

    Block [blk, 16, 128]: lane c is an independent run; rows are consecutive
    elements of that run.  log2(blk) in-VMEM ladder steps + one carry
    multiply replace log2(n) full-array HBM-round-trip multiplies."""
    ctx = _ctx_by_name(ctx_name)
    p_limbs, _, n0 = _fc(ctx)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        for j in range(NLIMBS):
            carry_ref[j, :] = jnp.full((128,), ctx.one_mont_np[j], jnp.uint32)

    cols = [x_ref[:, j, :] for j in range(NLIMBS)]
    s = 1
    while s < blk:
        shifted = [
            jnp.concatenate(
                [jnp.full((s, 128), ctx.one_mont_np[j], jnp.uint32),
                 cols[j][:-s]],
                axis=0,
            )
            for j in range(NLIMBS)
        ]
        cols = lk.mont_mul_full(cols, shifted, p_limbs, n0)
        s <<= 1
    carry = [carry_ref[j, :][None, :] for j in range(NLIMBS)]  # [1,128] bcast
    cols = lk.mont_mul_full(cols, carry, p_limbs, n0)
    for j in range(NLIMBS):
        o_ref[:, j, :] = cols[j]
        carry_ref[j, :] = cols[j][blk - 1, :]


def _lane_bcast_mul_kernel(x_ref, f_ref, o_ref, *, ctx_name):
    """out[r, :, c] = x[r, :, c] * f[:, c] (per-lane constant factor)."""
    p_limbs, _, n0 = _fc(_ctx_by_name(ctx_name))
    cols = [x_ref[:, j, :] for j in range(NLIMBS)]
    f = [f_ref[j, :][None, :] for j in range(NLIMBS)]
    _store_t(o_ref, lk.mont_mul_full(cols, f, p_limbs, n0))


def prefix_prod_fused(x, ctx=None):
    """Inclusive prefix product along axis 0 of a [n, 16] Montgomery array.

    Two Pallas kernels replace the 15-launch Hillis–Steele shift ladder
    (field_jax.prefix_prod): elements are laid out lane-major as 128
    independent runs of n/128 rows, kernel 1 prefix-multiplies each run
    (in-VMEM ladder + sequential-grid carry), a 7-step ladder on the 128
    run totals builds per-lane offsets host^Wdevice-side in XLA, and
    kernel 2 folds the offsets in.  ~log2(B)+2 multiplies/element vs
    log2(n), and 2 HBM round trips vs 15.

    Alignment: rows = n/128 must be a multiple of the block height
    blk = min(32, rows) — i.e. n % 1024 == 0 AND (rows < 32 or
    rows % 32 == 0).  n = 5120 (rows = 40) would satisfy the old
    `n % 1024 == 0` check but leave rows beyond grid*blk unwritten
    (ADVICE r4 medium); such shapes fall back to the shift ladder."""
    from cap_tpu.ops import field_jax as fj

    ctx = ctx or fj.FR_CTX
    n = x.shape[0]
    rows = n // 128
    blk = min(32, rows)
    if not use_pallas() or n % 1024 != 0 or rows % blk != 0:
        return fj.prefix_prod(x, ctx)
    t = x.reshape(128, rows, NLIMBS).transpose(1, 2, 0)  # [R,16,128]
    spec = pl.BlockSpec((blk, NLIMBS, 128), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    pref = pl.pallas_call(
        partial(_lane_prefix_kernel, ctx_name=ctx.name, blk=blk),
        grid=(rows // blk,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((rows, NLIMBS, 128), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((NLIMBS, 128), jnp.uint32)],
    )(t)
    totals_em = pref[-1].transpose(1, 0)                  # [128,16]
    offs_em = jnp.concatenate(
        [fj.one_mont((1,), ctx), fj.prefix_prod(totals_em, ctx)[:-1]], axis=0
    )
    fspec = pl.BlockSpec((NLIMBS, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_lane_bcast_mul_kernel, ctx_name=ctx.name),
        grid=(rows // blk,),
        in_specs=[spec, fspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((rows, NLIMBS, 128), jnp.uint32),
    )(pref, offs_em.transpose(1, 0))
    return out.transpose(2, 0, 1).reshape(n, NLIMBS)


def suffix_prod_fused(x, ctx=None):
    """Inclusive suffix product along axis 0 (reverse of prefix_prod_fused)."""
    return jnp.flip(prefix_prod_fused(jnp.flip(x, 0), ctx), 0)


# ---------------------------------------------------------------------------
# in-kernel Fermat inversion (round 5)
#
# The scan-based fj.inv costs ~35 ms for ANY batch size on this runtime
# (508 sequential 16-step lax.scan mont_muls at ~60 us each) — it sat inside
# round 2's grand-product program (z_phase total inversion) and dominated
# the batch-affine engine's per-chunk-step fixed cost.  One rolled-loop
# Pallas kernel (2 block-muls per exponent bit, bit table in SMEM) does the
# same in ~1.3 ms.
# ---------------------------------------------------------------------------


def _fermat_kernel(bits_ref, x_ref, o_ref, *, ctx_name, nbits):
    from jax import lax

    ctx = _ctx_by_name(ctx_name)
    p_limbs, _, n0 = _fc(ctx)
    x = _load_t(x_ref)
    grp = x_ref.shape[0]
    acc0 = [jnp.full((grp, 128), np.uint32(int(ctx.one_mont_np[j])), jnp.uint32)
            for j in range(NLIMBS)]

    def body(j, acc):
        acc = lk.mont_mul_cols(acc, acc, p_limbs, n0)
        withx = lk.mont_mul_cols(acc, x, p_limbs, n0)
        bit = bits_ref[j]
        return [jnp.where(bit != 0, a, b) for a, b in zip(withx, acc)]

    acc = lax.fori_loop(0, nbits, body, acc0)
    _store_t(o_ref, lk.cond_sub_p(acc, p_limbs))


import numpy as np


def fermat_inv_pallas(x, ctx=None):
    """Batched modular inverse x^(p-2) on [m, 16] Montgomery arrays (m %
    128 == 0) via a single rolled-loop kernel; 0 maps to 0 like fj.inv.
    Canonical output.  Falls back to fj.inv off-TPU."""
    from cap_tpu.ops import field_jax as fj

    ctx = ctx or fj.FR_CTX
    m = x.shape[0]
    if not use_pallas() or m % 128 != 0:
        return fj.inv(x, ctx)
    e = ctx.p_int - 2
    nbits = e.bit_length()
    bits = jnp.asarray(
        [(e >> (nbits - 1 - j)) & 1 for j in range(nbits)], jnp.int32
    )
    n128 = m // 128
    grp = _grp_for(n128)
    spec = pl.BlockSpec((grp, NLIMBS, 128), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_fermat_kernel, ctx_name=ctx.name, nbits=nbits),
        grid=(n128 // grp,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n128, NLIMBS, 128), jnp.uint32),
    )(bits, to_limb_major(x))
    return from_limb_major(out)


def inv_elem(x, ctx=None):
    """Inverse of a small [m, 16] batch (any m): pads to one 128-lane tile
    for the rolled Fermat kernel; scan Fermat off-TPU."""
    from cap_tpu.ops import field_jax as fj

    ctx = ctx or fj.FR_CTX
    m = x.shape[0]
    if not use_pallas():
        return fj.inv(x, ctx)
    mp = ((m + 127) // 128) * 128
    xp = jnp.concatenate(
        [x, jnp.broadcast_to(jnp.asarray(ctx.one_mont_np), (mp - m, NLIMBS))],
        axis=0,
    )
    return fermat_inv_pallas(xp, ctx)[:m]


def ec_add_mixed_pallas(acc, g_affine, mask):
    """acc: (x,y,z) [N,16] projective; g_affine: (x,y) [N,16]; mask [N] uint32
    (0 -> keep acc).  Returns new (x,y,z) in [N,16] layout (redundant)."""
    acc_t = tuple(to_limb_major(c) for c in acc)
    g_t = tuple(to_limb_major(c) for c in g_affine)
    out = ec_add_mixed_pallas_tiled(acc_t, g_t, mask.reshape(-1, 1, 128))
    return tuple(from_limb_major(o) for o in out)
