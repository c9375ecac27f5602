"""EC/mont kernel variant shootout (run on the TPU).

Variants probed against the production signed mixed-add MSM inner loop:
  1. mont_mul kernel: CIOS vs separated-product (limb_kernels.mont_mul_cols_sep)
  2. the full 16-chunk accumulation loop: baseline vs sep-mul EC kernel
  3. gather layout: element-major u16 table (+transpose) vs limb-major table

Usage: python scripts/probe_ec_variants.py
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import random

import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cap_tpu.fields.host import FQ, FR, NLIMBS
from cap_tpu.ops import ec, field_jax as fj, limb_kernels as lk, msm_signed as ms
from cap_tpu.ops import pallas_field as pfl
from cap_tpu.ops.limbs import ints_to_limbs

random.seed(11)


def timeit(label, fn, reps=5):
    r = fn()
    jax.tree.map(np.asarray, r)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        r = fn()
        jax.tree.map(np.asarray, r)
        ts.append(time.time() - t0)
    t = min(ts) - 0.028
    print(f"{label:52s} {t*1e3:9.2f} ms", flush=True)
    return t


# ---------------------------------------------------------------------------
# 1. mont_mul kernel variants
# ---------------------------------------------------------------------------

N = 1 << 19
xs = ints_to_limbs([random.randrange(FQ.p) for _ in range(4096)], FQ)
X = jnp.asarray(np.tile(xs, (N // 4096, 1)))
Xt = pfl.to_limb_major(X)


def _mont_kernel(mulf, x_ref, y_ref, o_ref):
    fc = lk.field_consts(fj.FQ_CTX)
    x = [x_ref[:, j, :] for j in range(NLIMBS)]
    y = [y_ref[:, j, :] for j in range(NLIMBS)]
    out = mulf(x, y, fc[0], fc[2])
    for j in range(NLIMBS):
        o_ref[:, j, :] = out[j]


def mont_variant(mulf, reps=16):
    spec = pl.BlockSpec((8, NLIMBS, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        partial(_mont_kernel, mulf),
        grid=(N // 1024,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((N // 128, NLIMBS, 128), jnp.uint32),
    )

    @jax.jit
    def run(a):
        for _ in range(reps):
            a = call(a, Xt)
        return a[:1]

    return lambda: run(Xt)


WHICH = set(sys.argv[1:]) or {"mont", "loop", "gather"}

if "mont" in WHICH:
    t_cios = timeit("mont_mul CIOS (16x chained, 2^19)", mont_variant(lk.mont_mul_cols))
    t_sep = timeit("mont_mul separated (16x chained, 2^19)", mont_variant(lk.mont_mul_cols_sep))
    for lbl, t in (("CIOS", t_cios), ("sep", t_sep)):
        print(f"    {lbl}: {16 * N / t / 1e9:.3f} G modmul/s")

# ---------------------------------------------------------------------------
# 2. the production chunk loop at k=5, m=2^15 (c from env like the prover)
# ---------------------------------------------------------------------------

K = 5
M = 1 << 15
print(f"building signed table m=2^15 (c={ms.WINDOW_BITS}) ...", flush=True)
pts = [ints_to_limbs([random.randrange(FQ.p)], FQ)[0] for _ in range(64)]
# fake table points are fine for timing (values in-range, no EC validity needed)
px = jnp.asarray(np.stack([p for p in pts] * (M // 64)))
py = jnp.asarray(np.stack([p for p in pts] * (M // 64)))
t0 = time.time()
tab = ms.build_signed_table(px, py, M)
np.asarray(tab[0, 0])
print(f"  table built in {time.time()-t0:.1f} s  shape={tab.shape}", flush=True)

sc = np.stack(
    [np.asarray(ints_to_limbs([random.randrange(FR.p) for _ in range(M)], FR))
     for _ in range(K)]
)
scal = jnp.asarray(sc)


def loop_baseline():
    f = jax.jit(ms.msm_signed_windows_device)
    return lambda: f(tab, scal)


if "loop" in WHICH:
    timeit("chunk loop baseline (k=5, 2^15)", loop_baseline())

if "sep" in WHICH:
    # sep-mul variant: monkeypatch the multiplier used by the EC col formulas
    _orig = lk.mont_mul_cols
    lk.mont_mul_cols = lk.mont_mul_cols_sep

    def _fresh_windows(table, scalars_batch):
        return ms.msm_signed_windows_device(table, scalars_batch)

    try:
        f_sep = jax.jit(_fresh_windows)
        timeit("chunk loop sep-mul (k=5, 2^15)", lambda: f_sep(tab, scal))
    finally:
        lk.mont_mul_cols = _orig

# ---------------------------------------------------------------------------
# 3. gather layout: limb-major table (gather straight into tiled layout)
# ---------------------------------------------------------------------------

# current layout: [513, mp, 32] u16, gather -> [kw, C, 32] -> u32 -> transpose
# candidate:      [513, mp/128, 32, 128] u16, gather on axis 0 -> already tiled
if "gather" in WHICH:
    tab_lm = jnp.asarray(
        np.ascontiguousarray(
            np.asarray(tab).reshape(ms.TABLE_ROWS, M // 128, 128, 32).transpose(0, 1, 3, 2)
        )
    )

KW = K * ms.NUM_WINDOWS
C = ms.WCHUNK


def loop_limbmajor():
    absd_h, neg_h = jax.jit(jax.vmap(ms.signed_digits_device))(scal)

    @jax.jit
    def run(tab_lm, absd, neg):
        absd = jnp.moveaxis(absd, 2, 1).reshape(KW, M)
        neg = jnp.moveaxis(neg, 2, 1).reshape(KW, M)
        nlanes = KW * C
        ident = ec.identity((nlanes,))
        acc_t = tuple(pfl.to_limb_major(c) for c in ident)
        nchunks = M // C

        def chunk_body(c, acc_t):
            dg = lax.dynamic_slice_in_dim(absd, c * C, C, axis=1)  # [KW, C]
            ng = lax.dynamic_slice_in_dim(neg, c * C, C, axis=1)
            rows = lax.dynamic_slice_in_dim(tab_lm, c * (C // 128), C // 128, axis=1)
            # rows: [513, C/128, 32, 128]; want out[w, cc, :, l] = rows[dg[w, cc*128+l], cc, :, l]
            dg4 = dg.reshape(KW, C // 128, 1, 128)
            g = jnp.take_along_axis(rows[:, None], dg4[None], axis=0)[0]
            # g: [KW, C/128, 32, 128] u16 -> u32, already limb-major tiled
            g32 = g.astype(jnp.uint32).reshape(KW * (C // 128), 32, 128)
            gx, gy = g32[:, :NLIMBS], g32[:, NLIMBS:]
            mask3 = (dg != 0).astype(jnp.uint32).reshape(-1, 1, 128)
            negm = ng.reshape(-1, 1, 128).astype(jnp.uint32)
            return pfl.ec_add_mixed_signed_pallas_tiled(acc_t, (gx, gy), mask3, negm)

        return lax.fori_loop(0, nchunks, chunk_body, acc_t)

    return lambda: run(tab_lm, absd_h, neg_h)


if "gather" in WHICH:
    timeit("chunk loop limb-major gather (k=5, 2^15)", loop_limbmajor())
