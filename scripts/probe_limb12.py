"""Probe: radix-12 signed-column mont_mul vs 16-bit CIOS in Pallas.

Correctness first (CPU/XLA path, small batch, vs host bigints), then TPU
throughput: 16 chained modmuls per element, like probe_ec_variants' mont
section (chained = latency-bound, the regime the EC add kernel lives in).

Usage: python scripts/probe_limb12.py [cpu|tpu]
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

MODE = sys.argv[1] if len(sys.argv) > 1 else "tpu"
if MODE == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import random

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cap_tpu.fields.host import FQ, NLIMBS
from cap_tpu.ops import field_jax as fj, limb_kernels as lk
import limb12_probe_lib as l12
from cap_tpu.ops.limbs import ints_to_limbs, limbs_to_ints

random.seed(13)

P = FQ.p
R264 = pow(2, 264, P)

# --- correctness (runs on any backend, XLA level) --------------------------

n = 256
a_int = [random.randrange(2 * P - 1) for _ in range(n)]  # redundant-range in
b_int = [random.randrange(P) for _ in range(n)]
A = jnp.asarray(ints_to_limbs(a_int))  # plain limbs: mont-264 math checked
B = jnp.asarray(ints_to_limbs(b_int))  # directly against host bigints


def unstack(arr):
    return [arr[:, j] for j in range(NLIMBS)]


@jax.jit
def mm12_xla(a, b):
    p12, n0 = l12.consts12(fj.FQ_CTX)
    va = l12.from16(unstack(a))
    vb = l12.from16(unstack(b))
    out = l12.mont_mul12(va, vb, p12, n0)
    return jnp.stack(l12.to16_exit(out, P), axis=-1)


got = limbs_to_ints(np.asarray(mm12_xla(A, B)))
rinv = pow(R264, -1, P)
want = [(x * y % P) * rinv % P for x, y in zip(a_int, b_int)]
assert [g % P for g in got] == want, "mont_mul12 mismatch"
print("mont_mul12 XLA correctness: OK (R = 2^264)")


# add/sub/mul_small mix through an exit
@jax.jit
def mix12_xla(a, b):
    p12, n0 = l12.consts12(fj.FQ_CTX)
    va = l12.from16(unstack(a))
    vb = l12.from16(unstack(b))
    t = l12.mont_mul12(l12.add12(va, vb), l12.sub12(va, vb), p12, n0)
    t = l12.sub12(l12.mul_small12(t, 9), va)
    t = l12.mont_mul12(t, t, p12, n0)
    return jnp.stack(l12.to16_exit(t, P), axis=-1)


got = limbs_to_ints(np.asarray(mix12_xla(A, B)))
want = []
for x, y in zip(a_int, b_int):
    t = (x + y) * (x - y) % P * rinv % P
    t = (9 * t - x) % P
    want.append(t * t % P * rinv % P)
assert [g % P for g in got] == want, "mix mismatch"
print("add/sub/mul_small/exit mix: OK")

if MODE == "cpu":
    sys.exit(0)

# --- TPU throughput: 16 chained modmuls ------------------------------------

N = 1 << 19
xs = ints_to_limbs([random.randrange(P) for _ in range(4096)], FQ)
X = jnp.asarray(np.tile(xs, (N // 4096, 1)))
Xt = jnp.asarray(
    np.asarray(X).reshape(-1, 128, NLIMBS).transpose(0, 2, 1)
)  # limb-major [N/128, 16, 128]


def timeit(label, fn, reps=5):
    r = fn()
    np.asarray(r)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(fn())
        ts.append(time.time() - t0)
    t = min(ts) - 0.028
    print(f"{label:52s} {t*1e3:9.2f} ms   {16 * N / t / 1e9:.3f} G modmul/s")
    return t


def _kernel12(x_ref, y_ref, o_ref, *, chain):
    p12, n0 = l12.consts12(fj.FQ_CTX)
    x16 = [x_ref[:, j, :] for j in range(NLIMBS)]
    y16 = [y_ref[:, j, :] for j in range(NLIMBS)]
    a = l12.from16(x16)
    y = l12.from16(y16)
    for _ in range(chain):
        a = l12.mont_mul12(a, y, p12, n0)
    out = l12.to16_exit(a, P)
    for j in range(NLIMBS):
        o_ref[:, j, :] = out[j]


def run12():
    spec = pl.BlockSpec((8, NLIMBS, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        partial(_kernel12, chain=16),
        grid=(N // 1024,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((N // 128, NLIMBS, 128), jnp.uint32),
    )
    f = jax.jit(lambda a: call(a, Xt)[:1])
    return lambda: f(Xt)


def _kernel16(x_ref, y_ref, o_ref, *, chain):
    fc = lk.field_consts(fj.FQ_CTX)
    x = [x_ref[:, j, :] for j in range(NLIMBS)]
    y = [y_ref[:, j, :] for j in range(NLIMBS)]
    for _ in range(chain):
        x = lk.mont_mul_cols(x, y, fc[0], fc[2])
    for j in range(NLIMBS):
        o_ref[:, j, :] = x[j]


def run16():
    spec = pl.BlockSpec((8, NLIMBS, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        partial(_kernel16, chain=16),
        grid=(N // 1024,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((N // 128, NLIMBS, 128), jnp.uint32),
    )
    f = jax.jit(lambda a: call(a, Xt)[:1])
    return lambda: f(Xt)


timeit("mont_mul 16-bit CIOS (16x chained, 2^19)", run16())
timeit("mont_mul radix-12 signed (16x chained, 2^19)", run12())
