"""Batch-affine signed-window MSM — round-5 commit engine (CAP_MSM=affine).

Same fixed-base signed-digit structure and uint16 digit table as
`msm_signed.py` (digit extraction, [513, mp, 32] table, per-window lane
accumulation over WCHUNK-sized chunks, lane-fold tree, Horner), but the
inner accumulation keeps the per-lane accumulator in AFFINE coordinates
and replaces the complete projective mixed add (~9.5 montgomery-multiply
equivalents after the mont_mul2 fusion, ~15 measured with selects/loads)
with an affine chord add at ~7 multiplies:

    per chunk step, every lane needs 1/(x_pt - x_acc); the Montgomery
    batch-inversion trick amortizes ALL of those inversions into
      fwd:  1 mul/lane   (1024 parallel chains: one (8,128)-vreg running
                          product per grid step, carried across the grid)
      tiny: one batched inversion of the 1024 chain totals (XLA ladder)
      bwd:  2 mul/lane   (reverse-grid walk: inv_i = P_{i-1} * Q; Q *= d_i)
    then the add itself:  lambda (1) + lambda^2 (1) + y3 (1) + the
    doubling-branch numerator 3*x^2 (1) = 4 muls.

Correctness is complete, not probabilistic: per-lane selects handle the
identity accumulator (chain start / masked digit-0 lanes), the doubling
case (x_a == x_b, y_a == y_b -> chord slope replaced by tangent), and the
cancellation case (x_a == x_b, y_a != y_b -> infinity), with denominators
forced to 1 on every exceptional path so the shared inversion chain stays
valid.  Coordinates are canonicalized ([0, p)) at each step boundary so
the equality tests are exact field equality.

Reference role: arkworks Pippenger inside jf-plonk (SURVEY.md §2.2 L1);
the batch-affine bucket trick mirrors what production GPU/FPGA MSM
implementations do, mapped onto the VPU lane model (chains across grid
steps instead of down a thread).

Off-TPU this module delegates to msm_signed (the CPU suite and the
virtual-mesh dryrun never run these Mosaic kernels); on-chip equality vs
the signed engine is checked by scripts/probe_affine.py and the TPU-gated
test in tests/test_msm_affine.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cap_tpu.fields.host import NLIMBS
from cap_tpu.ops import ec, field_jax as fj, pallas_field as pfl
from cap_tpu.ops import limb_kernels as lk
from cap_tpu.ops import msm_signed as msg

NUM_WINDOWS = msg.NUM_WINDOWS
WCHUNK = msg.WCHUNK


def _fq_consts():
    return lk.field_consts(fj.FQ_CTX)


def _one_cols(shape):
    one = fj.FQ_CTX.one_mont_np
    return [jnp.full(shape, np.uint32(int(one[j])), jnp.uint32)
            for j in range(NLIMBS)]


def _eq_cols(a, b):
    """Exact limb equality of two canonical limb lists -> bool array."""
    acc = a[0] == b[0]
    for j in range(1, NLIMBS):
        acc = acc & (a[j] == b[j])
    return acc


def _neg_canon(y, p_limbs):
    """p - y for canonical y in (0, p) -> canonical (exact limb subtract)."""
    return lk.sub_mod([jnp.zeros_like(c) for c in y], y, p_limbs)


def _point_cases(ax, ay, ainf, gx, gy, pinf):
    """Shared case analysis for the affine chord add acc + pt.

    All coords canonical.  Returns (d, dbl, cancel) where d is the
    denominator limb list (< 2p, never 0 as a field element):
      normal  -> x_pt - x_acc
      dbl     -> 2*y_acc
      skip/cancel/inf -> 1
    """
    p_limbs, p2, n0 = _fq_consts()
    both = (~ainf) & (~pinf)
    eqx = _eq_cols(ax, gx)
    eqy = _eq_cols(ay, gy)
    dbl = both & eqx & eqy
    cancel = both & eqx & (~eqy)
    d = lk.sub_mod_2p(gx, ax, p2)
    d = lk.select(dbl, lk.dbl_mod_2p(ay, p2), d)
    skip = ainf | pinf | cancel
    d = lk.select(skip, _one_cols(d[0].shape), d)
    return d, dbl, cancel


def _affine_fwd_kernel(ax_ref, ay_ref, af_ref, gx_ref, gy_ref,
                       mask_ref, neg_ref, p_ref, carry_ref):
    """Denominators + running per-chain prefix product.

    Chains are the 1024 (sublane, lane) positions of an (8, NLIMBS, 128)
    block; consecutive chain elements live in consecutive grid blocks, so
    each grid step advances every chain by exactly one multiply."""
    p_limbs, p2, n0 = _fq_consts()
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        one = fj.FQ_CTX.one_mont_np
        for j in range(NLIMBS):
            carry_ref[:, j, :] = jnp.full((8, 128), np.uint32(int(one[j])),
                                          jnp.uint32)

    ax, ay = pfl._load_t(ax_ref), pfl._load_t(ay_ref)
    gx, gy = pfl._load_t(gx_ref), pfl._load_t(gy_ref)
    ainf = af_ref[:, 0, :] != 0
    pinf = mask_ref[:, 0, :] == 0
    negm = neg_ref[:, 0, :] != 0
    y_pt = lk.select(negm, _neg_canon(gy, p_limbs), gy)
    d, _dbl, _cancel = _point_cases(ax, ay, ainf, gx, y_pt, pinf)
    carry = [carry_ref[:, j, :] for j in range(NLIMBS)]
    pref = lk.mont_mul_cols(carry, d, p_limbs, n0)
    for j in range(NLIMBS):
        p_ref[:, j, :] = pref[j]
        carry_ref[:, j, :] = pref[j]


def _affine_bwd_kernel(ax_ref, ay_ref, af_ref, gx_ref, gy_ref,
                       mask_ref, neg_ref, p_ref, pprev_ref, cinv_ref,
                       ox_ref, oy_ref, of_ref, q_ref, *, nblocks):
    """Reverse-grid walk: per-lane inverse recovery + affine chord add."""
    p_limbs, p2, n0 = _fq_consts()
    mm = lambda a, b: lk.mont_mul_cols(a, b, p_limbs, n0)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        for j in range(NLIMBS):
            q_ref[:, j, :] = cinv_ref[:, j, :]

    ax, ay = pfl._load_t(ax_ref), pfl._load_t(ay_ref)
    gx, gy = pfl._load_t(gx_ref), pfl._load_t(gy_ref)
    ainf = af_ref[:, 0, :] != 0
    pinf = mask_ref[:, 0, :] == 0
    negm = neg_ref[:, 0, :] != 0
    y_pt = lk.select(negm, _neg_canon(gy, p_limbs), gy)
    d, dbl, cancel = _point_cases(ax, ay, ainf, gx, y_pt, pinf)

    # chain bookkeeping: this grid step processes block (nblocks-1-i); its
    # elements' previous-in-chain prefixes live one block earlier (pprev is
    # the prefix array shifted by one block; block 0 is the chain head,
    # whose "previous prefix" is 1)
    head = i == nblocks - 1
    one = _one_cols((8, 128))
    pprev = [jnp.where(head, o, c)
             for o, c in zip(one, pfl._load_t(pprev_ref))]
    q = [q_ref[:, j, :] for j in range(NLIMBS)]
    inv = mm(pprev, q)                     # 1/d for this block's lanes
    q = mm(q, d)
    for j in range(NLIMBS):
        q_ref[:, j, :] = q[j]

    # chord / tangent slope
    sb = lambda a, b: lk.sub_mod_2p(a, b, p2)
    num = sb(y_pt, ay)
    xa2 = mm(ax, ax)
    num = lk.select(dbl, lk.mul_small_mod_2p(xa2, 3, p2), num)
    lam = mm(num, inv)
    x3 = sb(sb(mm(lam, lam), ax), gx)
    y3 = sb(mm(lam, sb(ax, x3)), ay)
    x3 = lk.cond_sub_p(lk.cond_sub_2p(x3, p2), p_limbs)
    y3 = lk.cond_sub_p(lk.cond_sub_2p(y3, p2), p_limbs)

    # output selects (order matters: later overrides win)
    ox, oy = x3, y3
    of = jnp.zeros((8, 128), jnp.uint32)
    of = jnp.where(cancel, jnp.uint32(1), of)
    ox = lk.select(pinf, ax, ox)
    oy = lk.select(pinf, ay, oy)
    of = jnp.where(pinf, af_ref[:, 0, :], of)
    ox = lk.select(ainf, gx, ox)
    oy = lk.select(ainf, y_pt, oy)
    of = jnp.where(ainf, pinf.astype(jnp.uint32), of)
    for j in range(NLIMBS):
        ox_ref[:, j, :] = ox[j]
        oy_ref[:, j, :] = oy[j]
    of_ref[:, 0, :] = of


def _spec(grp=8):
    return pl.BlockSpec((grp, NLIMBS, 128), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _mspec():
    return pl.BlockSpec((8, 1, 128), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _affine_step(acc, gx_t, gy_t, mask3, neg3):
    """One chunk step: acc (x,y,inf tiled, canonical) += masked/signed pts."""
    ax, ay, af = acc
    n128 = ax.shape[0]
    assert n128 % 8 == 0
    nblocks = n128 // 8
    spec, mspec = _spec(), _mspec()
    P = pl.pallas_call(
        _affine_fwd_kernel,
        grid=(nblocks,),
        in_specs=[spec, spec, mspec, spec, spec, mspec, mspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n128, NLIMBS, 128), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((8, NLIMBS, 128), jnp.uint32)],
    )(ax, ay, af, gx_t, gy_t, mask3, neg3)

    totals = pfl.from_limb_major(P[n128 - 8:])          # [1024, 16]
    cinv = msg._batch_inverse(totals, fj.FQ_CTX)
    cinv_t = pfl.to_limb_major(cinv)                    # [8, 16, 128]
    ones_blk = jnp.broadcast_to(
        pfl.to_limb_major(fj.one_mont((1024,), fj.FQ_CTX)), (8, NLIMBS, 128)
    )
    pprev = jnp.concatenate([ones_blk, P[:-8]], axis=0)

    rev = lambda i: (nblocks - 1 - i, 0, 0)
    rspec = pl.BlockSpec((8, NLIMBS, 128), rev, memory_space=pltpu.VMEM)
    rmspec = pl.BlockSpec((8, 1, 128), rev, memory_space=pltpu.VMEM)
    cspec = pl.BlockSpec((8, NLIMBS, 128), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    ox, oy, of = pl.pallas_call(
        partial(_affine_bwd_kernel, nblocks=nblocks),
        grid=(nblocks,),
        in_specs=[rspec, rspec, rmspec, rspec, rspec, rmspec, rmspec,
                  rspec, rspec, cspec],
        out_specs=[rspec, rspec, rmspec],
        out_shape=[
            jax.ShapeDtypeStruct((n128, NLIMBS, 128), jnp.uint32),
            jax.ShapeDtypeStruct((n128, NLIMBS, 128), jnp.uint32),
            jax.ShapeDtypeStruct((n128, 1, 128), jnp.uint32),
        ],
        scratch_shapes=[pltpu.VMEM((8, NLIMBS, 128), jnp.uint32)],
    )(ax, ay, af, gx_t, gy_t, mask3, neg3, P, pprev, cinv_t)
    return ox, oy, of


def msm_affine_windows_device(table, scalars_batch):
    """Batched fixed-base MSM window sums, batch-affine accumulation.

    Same contract as msm_signed.msm_signed_windows_device: table
    [513, mp, 32] uint16, scalars [k, mp, 16] plain limbs ->
    [k, 26, 3, 16] canonical projective window sums."""
    if not pfl.use_pallas():
        return msg.msm_signed_windows_device(table, scalars_batch)
    tab = table
    mp = tab.shape[1]
    k, n, _ = scalars_batch.shape
    assert n == mp, (n, mp)
    nchunks = mp // WCHUNK
    kw = k * NUM_WINDOWS
    nlanes = kw * WCHUNK

    absd, neg = jax.vmap(msg.signed_digits_device)(scalars_batch)
    absd = jnp.moveaxis(absd, 2, 1).reshape(kw, mp)
    neg = jnp.moveaxis(neg, 2, 1).reshape(kw, mp)

    zero_t = jnp.zeros((nlanes // 128, NLIMBS, 128), jnp.uint32)
    inf_t = jnp.ones((nlanes // 128, 1, 128), jnp.uint32)
    acc0 = (zero_t, zero_t, inf_t)

    def chunk_body(c, acc):
        dg = lax.dynamic_slice_in_dim(absd, c * WCHUNK, WCHUNK, axis=1)
        ng = lax.dynamic_slice_in_dim(neg, c * WCHUNK, WCHUNK, axis=1)
        rows = lax.dynamic_slice_in_dim(tab, c * WCHUNK, WCHUNK, axis=1)
        gathered = jnp.take_along_axis(
            rows[:, None, :, :], dg[None, :, :, None], axis=0
        )[0]                                               # [kw, C, 32]
        g32 = gathered.astype(jnp.uint32).reshape(nlanes, 32)
        gx_t = pfl.to_limb_major(g32[:, :NLIMBS])
        gy_t = pfl.to_limb_major(g32[:, NLIMBS:])
        mask3 = (dg != 0).astype(jnp.uint32).reshape(-1, 1, 128)
        neg3 = ng.reshape(-1, 1, 128).astype(jnp.uint32)
        return _affine_step(acc, gx_t, gy_t, mask3, neg3)

    ax, ay, af = lax.fori_loop(0, nchunks, chunk_body, acc0)

    # affine + inf flag -> canonical projective, then the signed engine's
    # lane-fold tree and per-window combine
    inf_l = af.reshape(-1) != 0
    axf = pfl.from_limb_major(ax)
    ayf = pfl.from_limb_major(ay)
    one = fj.one_mont((nlanes,), fj.FQ_CTX)
    zero = fj.zero((nlanes,), fj.FQ_CTX)
    px = fj.select(~inf_l, axf, zero)
    py = fj.select(~inf_l, ayf, one)
    pz = fj.select(~inf_l, one, zero)
    acc_t = tuple(pfl.to_limb_major(c) for c in (px, py, pz))

    width = WCHUNK
    while width > 128:
        half = width // 2
        lo, hi = [], []
        for c in acc_t:
            c4 = c.reshape(kw, width // 128, NLIMBS, 128)
            lo.append(c4[:, : half // 128].reshape(-1, NLIMBS, 128))
            hi.append(c4[:, half // 128:].reshape(-1, NLIMBS, 128))
        acc_t = pfl.ec_add_pallas_tiled(tuple(lo), tuple(hi))
        width = half

    accs = tuple(
        pfl.from_limb_major(pfl.normalize_tiled(c)).reshape(kw, width, NLIMBS)
        for c in acc_t
    )
    acc = accs
    while width > 1:
        half = width // 2
        lo = tuple(c[:, :half] for c in acc)
        hi = tuple(c[:, half:width] for c in acc)
        acc = ec.ec_add(lo, hi)
        width = half
    t_win = tuple(c.reshape(k, NUM_WINDOWS, NLIMBS) for c in acc)
    return jnp.stack(t_win, axis=2)


def msm_affine_commit_device(table, scalars_batch):
    """Whole batched MSM on device (batch-affine inner loop): [k, 3, 16]."""
    if not pfl.use_pallas():
        return msg.msm_signed_commit_device(table, scalars_batch)
    t_win_s = msm_affine_windows_device(table, scalars_batch)
    k = t_win_s.shape[0]
    per = []
    for c in range(3):
        a = jnp.transpose(t_win_s[:, :, c, :], (1, 2, 0))
        a = jnp.pad(a, ((0, 0), (0, 0), (0, 128 - k)))
        per.append(a)
    ox, oy, oz = pfl.horner_fold_pallas(tuple(per), NUM_WINDOWS,
                                        msg.WINDOW_BITS)
    out = jnp.stack([ox, oy, oz], axis=0)
    return jnp.transpose(out[:, :, :k], (2, 0, 1))
