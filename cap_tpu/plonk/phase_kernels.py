"""Fused Pallas kernels for the prover's elementwise-heavy phases.

The round-1/2a prover ran the quotient gate/permutation evaluation and the
grand-product leg products through `field_jax`'s scan-based CIOS at XLA
level: every one of the ~55 modmuls per coset point round-tripped [8n, 17]
accumulators through HBM/VMEM boundaries, measuring ~0.07 G modmul/s in
situ.  These kernels keep a (GRP, 16, 128) tile of every operand in
VMEM/vregs and run the flat `limb_kernels` arithmetic end-to-end: one HBM
read per input, one write per output (~1.06 T u32 ops/s measured on the
flat madd pattern — scripts/probe_vpu_ops.py).

Reference role: the inner loops of jf-plonk's quotient_polynomial /
grand-product computation (SURVEY.md §3.1 hot-loop box).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cap_tpu.fields.host import NLIMBS
from cap_tpu.ops import field_jax as fj, limb_kernels as lk, pallas_field as pfl

GRP = 8

from cap_tpu.plonk.circuit import SELECTORS

SEL_IDX = {name: i for i, name in enumerate(SELECTORS)}


def _t(x):
    """[..., m, 16] element-major -> [..., m//128, 16, 128] limb-major."""
    shape = x.shape
    lead = shape[:-2]
    m = shape[-2]
    return x.reshape(lead + (m // 128, 128, NLIMBS)).swapaxes(-1, -2)


def _untile(a):
    """[m//128, 16, 128] -> [m, 16]."""
    return a.swapaxes(-1, -2).reshape(-1, NLIMBS)


def _scalar_cols(ref, row):
    return [ref[row, j] for j in range(NLIMBS)]


def _quotient_kernel(w_ref, z_ref, zw_ref, pi_ref, sel_ref, sig_ref, ksx_ref,
                     l1_ref, izh_ref, sc_ref, o_ref, *, one_mont):
    fc = lk.field_consts(fj.FR_CTX)
    p_limbs, p2, n0 = fc
    mm = lambda a, b: lk.mont_mul_cols(a, b, p_limbs, n0)
    ad = lambda a, b: lk.add_mod_2p(a, b, p2)
    sb = lambda a, b: lk.sub_mod_2p(a, b, p2)

    def ld(ref):
        return [ref[:, j, :] for j in range(NLIMBS)]

    def ld_i(ref, i):
        return [ref[i, :, j, :] for j in range(NLIMBS)]

    w = [ld_i(w_ref, i) for i in range(5)]
    z8 = ld(z_ref)
    zw8 = ld(zw_ref)
    pi8 = ld(pi_ref)
    sig = [ld_i(sig_ref, i) for i in range(5)]
    ksx = [ld_i(ksx_ref, i) for i in range(5)]
    l1 = ld(l1_ref)
    izh = ld(izh_ref)
    alpha = _scalar_cols(sc_ref, 0)
    alpha2 = _scalar_cols(sc_ref, 1)
    beta = _scalar_cols(sc_ref, 2)
    gamma = _scalar_cols(sc_ref, 3)

    S = lambda name: ld_i(sel_ref, SEL_IDX[name])

    def pow5(x):
        x2 = mm(x, x)
        return mm(mm(x2, x2), x)

    gate = mm(S("lc0"), w[0])
    gate = ad(gate, mm(S("lc1"), w[1]))
    gate = ad(gate, mm(S("lc2"), w[2]))
    gate = ad(gate, mm(S("lc3"), w[3]))
    gate = ad(gate, mm(S("mul0"), mm(w[0], w[1])))
    gate = ad(gate, mm(S("mul1"), mm(w[2], w[3])))
    gate = ad(gate, mm(S("hash0"), pow5(w[0])))
    gate = ad(gate, mm(S("hash1"), pow5(w[1])))
    gate = ad(gate, mm(S("hash2"), pow5(w[2])))
    gate = ad(gate, mm(S("hash3"), pow5(w[3])))
    prod = mm(mm(mm(w[0], w[1]), mm(w[2], w[3])), w[4])
    gate = ad(gate, mm(S("ecc"), prod))
    gate = ad(gate, S("c"))
    gate = sb(gate, mm(S("o"), w[4]))
    gate = ad(gate, pi8)

    fnum = None
    gden = None
    for j in range(5):
        nj = ad(ad(w[j], mm(beta, ksx[j])), gamma)
        dj = ad(ad(w[j], mm(beta, sig[j])), gamma)
        fnum = nj if fnum is None else mm(fnum, nj)
        gden = dj if gden is None else mm(gden, dj)
    perm = sb(mm(z8, fnum), mm(zw8, gden))
    one = [np.uint32(v) for v in one_mont]
    l1t = mm(sb(z8, [jnp.full_like(z8[0], o) for o in one]), l1)
    F = ad(gate, ad(mm(alpha, perm), mm(alpha2, l1t)))
    t8 = mm(F, izh)
    out = lk.cond_sub_p(t8, p_limbs)
    for j in range(NLIMBS):
        o_ref[:, j, :] = out[j]


def quotient_eval_pallas(w8, z8, zw8, pi8, sel, sig, ksx, l1, izh, scalars4,
                         one_mont_np):
    """Fused gate + permutation + vanishing-division evaluation on the 8n
    coset.  All poly args element-major [.., m8, 16]; scalars4 [4,16]
    (alpha, alpha^2, beta, gamma, Montgomery).  Returns t8 [m8, 16] < p."""
    m8 = z8.shape[0]
    wt, zt, zwt, pit = _t(w8), _t(z8), _t(zw8), _t(pi8)
    selt, sigt, ksxt = _t(sel), _t(sig), _t(ksx)
    l1t, izht = _t(l1), _t(izh)
    nblk = m8 // 128
    grp = pfl._grp_for(nblk)
    spec = lambda lead: pl.BlockSpec(
        (lead, grp, NLIMBS, 128), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
    )
    spec1 = pl.BlockSpec((grp, NLIMBS, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out = pl.pallas_call(
        partial(_quotient_kernel, one_mont=tuple(int(v) for v in one_mont_np)),
        grid=(nblk // grp,),
        in_specs=[spec(5), spec1, spec1, spec1, spec(13), spec(5), spec(5),
                  spec1, spec1, sspec],
        out_specs=spec1,
        out_shape=jax.ShapeDtypeStruct((nblk, NLIMBS, 128), jnp.uint32),
    )(wt, zt, zwt, pit, selt, sigt, ksxt, l1t, izht, scalars4)
    return _untile(out)


def _z_numden_kernel(w_ref, sig_ref, ksx_ref, sc_ref, num_ref, den_ref):
    fc = lk.field_consts(fj.FR_CTX)
    p_limbs, p2, n0 = fc
    mm = lambda a, b: lk.mont_mul_cols(a, b, p_limbs, n0)
    ad = lambda a, b: lk.add_mod_2p(a, b, p2)

    def ld_i(ref, i):
        return [ref[i, :, j, :] for j in range(NLIMBS)]

    beta = _scalar_cols(sc_ref, 0)
    gamma = _scalar_cols(sc_ref, 1)
    num = None
    den = None
    for j in range(5):
        wj = ld_i(w_ref, j)
        nj = ad(ad(wj, mm(beta, ld_i(ksx_ref, j))), gamma)
        dj = ad(ad(wj, mm(beta, ld_i(sig_ref, j))), gamma)
        num = nj if num is None else mm(num, nj)
        den = dj if den is None else mm(den, dj)
    num = lk.cond_sub_p(num, p_limbs)
    den = lk.cond_sub_p(den, p_limbs)
    for j in range(NLIMBS):
        num_ref[:, j, :] = num[j]
        den_ref[:, j, :] = den[j]


def z_numden_pallas(wire_evals, sigma_evals, ks_x, scalars2):
    """Fused grand-product leg products: returns (num, den) [n,16] < p.

    wire_evals/sigma_evals/ks_x: [5, n, 16]; scalars2 [2,16] (beta, gamma).
    """
    n = wire_evals.shape[1]
    wt, st, kt = _t(wire_evals), _t(sigma_evals), _t(ks_x)
    nblk = n // 128
    grp = pfl._grp_for(nblk)
    spec5 = pl.BlockSpec(
        (5, grp, NLIMBS, 128), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
    )
    spec1 = pl.BlockSpec((grp, NLIMBS, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec(memory_space=pltpu.SMEM)
    num, den = pl.pallas_call(
        _z_numden_kernel,
        grid=(nblk // grp,),
        in_specs=[spec5, spec5, spec5, sspec],
        out_specs=[spec1, spec1],
        out_shape=[jax.ShapeDtypeStruct((nblk, NLIMBS, 128), jnp.uint32)] * 2,
    )(wt, st, kt, scalars2)
    return _untile(num), _untile(den)
