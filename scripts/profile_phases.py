"""Time individual prover phase kernels on the TPU, amortized.

Each candidate runs CHAIN times inside one jit so the ~28 ms host-sync
latency of this runtime is amortized away.  Compares the fused Pallas
phase kernels against their scan-XLA equivalents piece by piece.

Usage: python scripts/profile_phases.py [mont ec ntt quotient z fold commit]
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

from cap_tpu.fields.host import FR, NLIMBS
from cap_tpu.ops import field_jax as fj, pallas_field as pfl
from cap_tpu.ops.limbs import ints_to_limbs
from cap_tpu.ops.ntt import get_domain, intt, ntt

random.seed(7)
CHAIN = int(os.environ.get("CAP_CHAIN", "16"))


def timeit(label, fn, reps=3, sync=lambda r: np.asarray(r)):
    r = fn()
    sync(r)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        sync(fn())
        ts.append(time.time() - t0)
    best = min(ts) - 0.028  # measured host-sync floor
    print(f"{label:50s} {best*1e3:9.2f} ms (chain {CHAIN})")
    return best


def rand_fr(*shape):
    n = int(np.prod(shape))
    return jnp.asarray(
        ints_to_limbs([random.randrange(FR.p) for _ in range(n)], FR)
    ).reshape(*shape, NLIMBS)


def bench_mont():
    n = 1 << 18
    x, y = rand_fr(n), rand_fr(n)

    @jax.jit
    def chain_p(a, b):
        for _ in range(CHAIN):
            a = pfl.mont_mul_pallas(a, b)
        return a[:1]

    t = timeit("mont_mul pallas-flat 2^18 chained", lambda: chain_p(x, y))
    print(f"    -> {n*CHAIN/t/1e9:.3f} G modmul/s")

    @jax.jit
    def chain_x(a, b):
        for _ in range(CHAIN):
            a = fj.mont_mul(a, b)
        return a[:1]

    t = timeit("mont_mul scan-XLA 2^18 chained", lambda: chain_x(x, y))
    print(f"    -> {n*CHAIN/t/1e9:.3f} G modmul/s")


def bench_ntt():
    for logn in (15, 18):
        n = 1 << logn
        dom = get_domain(n)
        x = rand_fr(n)

        @jax.jit
        def f(a, dom=dom):
            for _ in range(max(1, CHAIN // 4)):
                a = intt(ntt(a, dom), dom)
            return a[:1]

        t = timeit(f"ntt+intt 2^{logn} chained", lambda: f(x))
        per = t / (2 * max(1, CHAIN // 4))
        print(f"    -> {per*1e3:.2f} ms per transform")


def bench_quotient():
    from cap_tpu.parallel.mesh import _quotient_eval_xla
    from cap_tpu.plonk import phase_kernels as phk

    m8 = 1 << 18
    w8 = rand_fr(5, m8)
    z8 = rand_fr(m8)
    zw8 = jnp.roll(z8, -8, axis=0)
    pi8 = rand_fr(m8)
    sel = rand_fr(13, m8)
    sig = rand_fr(5, m8)
    ksx = rand_fr(5, m8)
    l1 = rand_fr(m8)
    izh = rand_fr(m8)
    al, be, ga = rand_fr(1)[0], rand_fr(1)[0], rand_fr(1)[0]
    al2 = fj.mont_sqr(al)
    sc4 = jnp.stack([al, al2, be, ga])

    reps = 2

    @jax.jit
    def f_pl(w8, z8, zw8, pi8, sel, sig, ksx, l1, izh, sc4):
        out = None
        for _ in range(reps):
            out = phk.quotient_eval_pallas(
                w8, z8, zw8, pi8, sel, sig, ksx, l1, izh, sc4, fj.FR_CTX.one_mont_np
            )
            z8 = out
        return out[:1]

    t = timeit("quotient eval pallas 2^18 chained",
               lambda: f_pl(w8, z8, zw8, pi8, sel, sig, ksx, l1, izh, sc4))
    print(f"    -> {t/reps*1e3:.1f} ms per eval")

    @jax.jit
    def f_x(w8, z8, zw8, pi8, sel, sig, ksx, l1, izh, al, be, ga):
        out = None
        for _ in range(reps):
            out = _quotient_eval_xla(w8, z8, zw8, pi8, sel, sig, ksx, l1, izh, al, be, ga)
            z8 = out
        return out[:1]

    t = timeit("quotient eval scan-XLA 2^18 chained",
               lambda: f_x(w8, z8, zw8, pi8, sel, sig, ksx, l1, izh, al, be, ga))
    print(f"    -> {t/reps*1e3:.1f} ms per eval")


def bench_z():
    from cap_tpu.plonk import phase_kernels as phk

    n = 1 << 15
    w = rand_fr(5, n)
    sig = rand_fr(5, n)
    ksx = rand_fr(5, n)
    be, ga = rand_fr(1)[0], rand_fr(1)[0]
    sc2 = jnp.stack([be, ga])
    reps = max(1, CHAIN // 4)

    @jax.jit
    def f_pl(w, sig, ksx, sc2):
        for _ in range(reps):
            num, den = phk.z_numden_pallas(w, sig, ksx, sc2)
            w = w.at[0].set(num)
        return num[:1]

    t = timeit("z num/den pallas 2^15 chained", lambda: f_pl(w, sig, ksx, sc2))
    print(f"    -> {t/reps*1e3:.2f} ms per eval")

    @jax.jit
    def ladder_pl(x):
        for _ in range(reps):
            x = fj.prefix_prod(x, mul=lambda a, b: pfl.mont_mul_pallas(a, b))
        return x[:1]

    @jax.jit
    def ladder_x(x):
        for _ in range(reps):
            x = fj.prefix_prod(x)
        return x[:1]

    x = rand_fr(n)
    t = timeit("prefix ladder pallas 2^15", lambda: ladder_pl(x))
    print(f"    -> {t/reps*1e3:.2f} ms per ladder")
    t = timeit("prefix ladder scan-XLA 2^15", lambda: ladder_x(x))
    print(f"    -> {t/reps*1e3:.2f} ms per ladder")


def bench_commit():
    from cap_tpu.plonk import srs as srs_mod
    from cap_tpu.plonk.prover import commit_batch_device, signed_table
    from cap_tpu.utils.rng import test_rng

    srs = srs_mod.universal_setup_for_staging(2**15 + 4, "data")
    m = 2**15 + 2
    t0 = time.time()
    signed_table(srs, m)
    print(f"signed table build 2^15: {time.time()-t0:.1f} s")
    for k in (1, 2, 5):
        c = rand_fr(k, m)
        cp = jax.jit(fj.from_mont)(c)
        f = lambda: commit_batch_device(srs, cp)
        t = timeit(f"commit_batch_device k={k} m=2^15", f,
                   sync=lambda r: np.asarray(r))
        print(f"    -> {k*26*m/t/1e6:.1f} M windowed-adds/s")


if __name__ == "__main__":
    which = set(sys.argv[1:]) or {"all"}
    print(f"devices: {jax.devices()} CHAIN={CHAIN}")
    if which & {"mont", "all"}:
        bench_mont()
    if which & {"ntt", "all"}:
        bench_ntt()
    if which & {"quotient", "all"}:
        bench_quotient()
    if which & {"z", "all"}:
        bench_z()
    if which & {"commit", "all"}:
        bench_commit()
