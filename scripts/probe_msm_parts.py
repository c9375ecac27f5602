"""Split the signed-window MSM's cost: table gather vs EC adds vs digits.

Times msm_signed_windows_device and ablated variants at k=5, m=2^15 on the
TPU (each timing includes the ~28 ms host-sync floor, subtracted).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import random

import jax.numpy as jnp
import numpy as np
from jax import lax

from cap_tpu.fields.host import FR, NLIMBS
from cap_tpu.ops import ec, field_jax as fj, msm_signed as ms, pallas_field as pfl
from cap_tpu.ops.msm import scalars_to_device

random.seed(3)


def timeit(label, fn, reps=3, sync=lambda r: np.asarray(r)):
    sync(fn())
    ts = []
    for _ in range(reps):
        t0 = time.time()
        sync(fn())
        ts.append(time.time() - t0)
    t = min(ts) - 0.028
    print(f"{label:46s} {t*1e3:9.2f} ms")
    return t


def variant(table, scalars_batch, *, do_gather=True, do_add=True):
    tab = table
    mp = tab.shape[1]
    k = scalars_batch.shape[0]
    nchunks = mp // ms.WCHUNK
    kw = k * ms.NUM_WINDOWS
    nlanes = kw * ms.WCHUNK

    absd, neg = jax.vmap(ms.signed_digits_device)(scalars_batch)
    absd = jnp.moveaxis(absd, 2, 1).reshape(kw, mp)
    neg = jnp.moveaxis(neg, 2, 1).reshape(kw, mp)
    ident = ec.identity((nlanes,))
    acc_t = tuple(pfl.to_limb_major(c) for c in ident)

    def chunk_body(c, acc_t):
        dg = lax.dynamic_slice_in_dim(absd, c * ms.WCHUNK, ms.WCHUNK, axis=1)
        ng = lax.dynamic_slice_in_dim(neg, c * ms.WCHUNK, ms.WCHUNK, axis=1)
        rows = lax.dynamic_slice_in_dim(tab, c * ms.WCHUNK, ms.WCHUNK, axis=1)
        if do_gather:
            gathered = jnp.take_along_axis(
                rows[:, None, :, :], dg[None, :, :, None], axis=0
            )[0]
        else:
            gathered = jnp.broadcast_to(
                rows[1][None], (kw, ms.WCHUNK, 32)
            )  # fixed row: no gather
        g32 = gathered.astype(jnp.uint32).reshape(nlanes, 32)
        gx, gy = g32[:, :NLIMBS], g32[:, NLIMBS:]
        mask3 = (dg != 0).astype(jnp.uint32).reshape(-1, 1, 128)
        negm = ng.reshape(-1, 1, 128).astype(jnp.uint32)
        g_t = (pfl.to_limb_major(gx), pfl.to_limb_major(gy))
        if do_add:
            return pfl.ec_add_mixed_signed_pallas_tiled(acc_t, g_t, mask3, negm)
        # no EC math: just force the gathered data to be consumed
        return tuple(a + g_t[0] * 0 for a in acc_t)

    acc_t = lax.fori_loop(0, nchunks, chunk_body, acc_t)
    return acc_t[0]


def main():
    m = 1 << 15
    k = 5
    from cap_tpu.crypto.bn254 import G1_GEN, g1_mul

    base = [g1_mul(G1_GEN, random.randrange(1, FR.p)) for _ in range(8)]
    pts = [base[i % 8] for i in range(4096)]
    px, py, _ = ec.points_to_device(pts)
    px = jnp.tile(px, (m // 4096, 1))
    py = jnp.tile(py, (m // 4096, 1))
    t0 = time.time()
    tab = ms.build_signed_table(px, py, m)
    np.asarray(tab[0, 0])
    print(f"table build 2^15 (levelized): {time.time()-t0:.1f} s")
    sb = jnp.stack(
        [scalars_to_device([random.randrange(FR.p) for _ in range(m)])
         for _ in range(k)]
    )

    f_full = jax.jit(lambda t, s: variant(t, s))
    f_nog = jax.jit(lambda t, s: variant(t, s, do_gather=False))
    f_noadd = jax.jit(lambda t, s: variant(t, s, do_add=False))
    t_full = timeit("windows: gather + EC adds", lambda: f_full(tab, sb),
                    sync=lambda r: np.asarray(r[:1, :1]))
    t_nog = timeit("windows: fixed row + EC adds (no gather)",
                   lambda: f_nog(tab, sb), sync=lambda r: np.asarray(r[:1, :1]))
    t_noadd = timeit("windows: gather only (no EC adds)",
                     lambda: f_noadd(tab, sb), sync=lambda r: np.asarray(r[:1, :1]))
    adds = k * ms.NUM_WINDOWS * m
    print(f"    full: {adds/t_full/1e6:.1f} M adds/s; gather share "
          f"~{(t_full-t_nog)*1e3:.0f} ms; add share ~{(t_full-t_noadd)*1e3:.0f} ms")


if __name__ == "__main__":
    main()
