"""Microbenchmarks for the field/EC/MSM/NTT kernels (run on the TPU).

Usage: python scripts/microbench_field.py [which ...]
  which ∈ {mont, ec, msm, ntt, scan, gather, all} (default: all)

Timing rule (BASELINE.md caution): a final np.asarray() of the result is the
only reliable sync on this runtime — block_until_ready does not block.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from cap_tpu.fields.host import FQ, FR, NLIMBS
from cap_tpu.ops import ec, field_jax as fj, msm as msm_mod, pallas_field as pfl
from cap_tpu.ops.limbs import ints_to_limbs, limbs_to_ints
from cap_tpu.ops.ntt import get_domain, intt, ntt

import random

random.seed(7)


def timeit(label, fn, reps=5, sync=lambda r: np.asarray(r)):
    fn_j = fn
    r = fn_j()
    sync(r)  # warm-up / compile
    ts = []
    for _ in range(reps):
        t0 = time.time()
        r = fn_j()
        sync(r)
        ts.append(time.time() - t0)
    best = min(ts)
    print(f"{label:55s} {best*1e3:10.2f} ms")
    return best


def rand_fr(n):
    return jnp.asarray(ints_to_limbs([random.randrange(FR.p) for _ in range(n)], FR))


def rand_fq(n):
    return jnp.asarray(ints_to_limbs([random.randrange(FQ.p) for _ in range(n)], FQ))


CHAIN = 8  # chained applications inside one jit (amortizes dispatch/transfer)


def bench_mont():
    n = 1 << 18
    x, y = rand_fr(n), rand_fr(n)

    def chained(mm):
        @jax.jit
        def f(a, b):
            for _ in range(CHAIN):
                a = mm(a, b)
            return a[:1]
        return f

    mm_scan = chained(lambda a, b: fj.mont_mul(a, b, fj.FR_CTX))
    t = timeit("mont_mul scan-XLA 2^18 x8", lambda: mm_scan(x, y))
    print(f"    -> {n*CHAIN/t/1e9:.3f} G modmul/s")
    mm_p = chained(lambda a, b: pfl.mont_mul_pallas(a, b, fj.FR_CTX))
    t = timeit("mont_mul pallas-flat 2^18 x8", lambda: mm_p(x, y))
    print(f"    -> {n*CHAIN/t/1e9:.3f} G modmul/s")
    # correctness spot check
    got = limbs_to_ints(np.asarray(pfl.mont_mul_pallas(x[:1024], y[:1024], fj.FR_CTX)), FR)
    xs = limbs_to_ints(np.asarray(x[:1024]), FR)
    ys = limbs_to_ints(np.asarray(y[:1024]), FR)
    assert got == [a * b % FR.p for a, b in zip(xs, ys)], "pallas mont_mul WRONG"
    print("    pallas mont_mul correct")


def _rand_points(n):
    # random multiples of G via the device path (fast enough at small n)
    from cap_tpu.crypto.bn254 import G1_GEN, g1j_from_affine, g1j_add, g1j_double, g1j_to_affine

    pts = []
    acc = g1j_from_affine(G1_GEN)
    for i in range(n):
        acc = g1j_add(g1j_double(acc), g1j_from_affine(G1_GEN))
        pts.append(g1j_to_affine(acc))
    return pts


def bench_ec():
    n = 1 << 15
    # synthetic coords (not on curve — fine for throughput)
    ax, ay, az = rand_fq(n), rand_fq(n), rand_fq(n)
    gx, gy = rand_fq(n), rand_fq(n)
    mask = jnp.ones((n,), jnp.uint32)

    @jax.jit
    def add_xla(a, g):
        for _ in range(CHAIN):
            a = ec.ec_add_mixed(a, g)
        return a[0][:1]

    t = timeit("ec_add_mixed XLA-scan 2^15 lanes x8", lambda: add_xla((ax, ay, az), (gx, gy)))
    print(f"    -> {n*CHAIN/t/1e6:.2f} M adds/s ({n*CHAIN*12/t/1e9:.3f} G mul-equiv/s)")

    mask3 = mask.reshape(-1, 1, 128)
    g_t = (pfl.to_limb_major(gx), pfl.to_limb_major(gy))
    a_t = tuple(pfl.to_limb_major(c) for c in (ax, ay, az))

    @jax.jit
    def add_p(a_t, g_t, m3):
        for _ in range(CHAIN):
            a_t = pfl.ec_add_mixed_pallas_tiled(a_t, g_t, m3)
        return a_t[0][:1]

    t = timeit("ec_add_mixed pallas-flat 2^15 lanes x8", lambda: add_p(a_t, g_t, mask3))
    print(f"    -> {n*CHAIN/t/1e6:.2f} M adds/s ({n*CHAIN*12/t/1e9:.3f} G mul-equiv/s)")


def bench_msm():
    m = 1 << 15
    pts = _rand_points(4096) * (m // 4096)
    scalars = [random.randrange(FR.p) for _ in range(m)]
    px, py, _ = ec.points_to_device(pts)
    tx, ty = msm_mod.build_window_table(px, py, m)
    sc = msm_mod.scalars_to_device(scalars)

    f_xla = jax.jit(lambda s: msm_mod.msm_windowed_device((tx, ty), s))
    t = timeit("msm_windowed XLA 2^15", lambda: f_xla(sc),
               sync=lambda r: np.asarray(r[0]))
    f_pl = jax.jit(lambda s: msm_mod.msm_windowed_device_pallas((tx, ty), s))
    t = timeit("msm_windowed pallas 2^15", lambda: f_pl(sc),
               sync=lambda r: np.asarray(r[0]))
    # cross-check results
    a = f_xla(sc)
    b = f_pl(sc)
    ha = msm_mod.horner_windows_host(msm_mod.tbits_to_host(tuple(np.asarray(c) for c in a)))
    hb = msm_mod.horner_windows_host(msm_mod.tbits_to_host(tuple(np.asarray(c) for c in b)))
    assert ha == hb, "pallas MSM disagrees with XLA MSM"
    print("    pallas MSM correct vs XLA")


def bench_gather():
    m = 1 << 15
    tx = jnp.zeros((256, m, NLIMBS), jnp.uint32)
    digits = jnp.asarray(np.random.randint(0, 256, size=(m, 32)), jnp.int32)

    @jax.jit
    def gather_all(tx, digits):
        out = jnp.zeros((32, msm_mod.WCHUNK, NLIMBS), jnp.uint32)
        def body(k, acc):
            txc = jax.lax.dynamic_slice_in_dim(tx, k * msm_mod.WCHUNK, msm_mod.WCHUNK, axis=1)
            dg = jax.lax.dynamic_slice_in_dim(digits, k * msm_mod.WCHUNK, msm_mod.WCHUNK, axis=0)
            idx = jnp.transpose(dg)[:, :, None]
            gx = jnp.take_along_axis(txc, idx, axis=0)
            return acc + gx
        return jax.lax.fori_loop(0, m // msm_mod.WCHUNK, body, out)

    timeit("msm gather-only (x coord) 2^15", lambda: gather_all(tx, digits),
           sync=lambda r: np.asarray(r[:1, :1]))


def bench_ntt():
    for logn in (15, 18):
        n = 1 << logn
        dom = get_domain(n)
        x = rand_fr(n)
        f = jax.jit(lambda a: ntt(a, dom)[:1])
        t = timeit(f"ntt 2^{logn}", lambda: f(x))


def bench_scan():
    # the z-phase grand-product prefix scan and the evals-phase power scan
    n = 1 << 15
    x = rand_fr(n)

    @jax.jit
    def prefix(a):
        return jax.lax.associative_scan(lambda u, v: fj.mont_mul(u, v), a, axis=0)[:1]

    timeit("associative_scan mont_mul 2^15", lambda: prefix(x))

    zeta = rand_fr(1)[0]

    @jax.jit
    def pows(s):
        base = jnp.broadcast_to(s, (n + 3, NLIMBS))
        inc = jax.lax.associative_scan(lambda u, v: fj.mont_mul(u, v), base, axis=0)
        return jnp.concatenate([fj.one_mont((1,)), inc[:-1]], axis=0)

    timeit("power-table scan (n+3, odd shape)", lambda: pows(zeta),
           sync=lambda r: np.asarray(r[:1]))

    @jax.jit
    def evdot(c, pw):
        return fj.field_sum(fj.mont_mul(c, pw), axis=-2)

    pw = pows(zeta)
    timeit("eval dot 2^15 (mul+tree-sum)", lambda: evdot(x, pw[:n]))


if __name__ == "__main__":
    which = set(sys.argv[1:]) or {"all"}
    print(f"devices: {jax.devices()}")
    if which & {"mont", "all"}:
        bench_mont()
    if which & {"ec", "all"}:
        bench_ec()
    if which & {"gather", "all"}:
        bench_gather()
    if which & {"msm", "all"}:
        bench_msm()
    if which & {"ntt", "all"}:
        bench_ntt()
    if which & {"scan", "all"}:
        bench_scan()
