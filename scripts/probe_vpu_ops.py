"""Probe raw VPU op throughput inside Pallas kernels (u32 mul/add/shift).

Determines what a modmul costs at speed-of-light on this chip: the flat
CIOS kernel spends ~512 u32 multiplies + ~2000 add/logic ops per modmul;
if u32 multiply is emulated (multi-pass), 16-bit-input multiplies or a
different limb radix may be the lever.

Usage: python scripts/probe_vpu_ops.py
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
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 20          # lanes
REPS = 64            # unrolled ops per loop iteration
LOOPS = 512          # fori_loop iterations inside the kernel


def run(label, kernel, *args, ops_per_rep=1, dtype=jnp.uint32):
    spec = pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        kernel,
        grid=(N // 1024,),
        in_specs=[spec] * len(args),
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((N // 128, 128), dtype),
    )
    fj = jax.jit(lambda *a: f(*a)[:1])
    r = fj(*args)
    np.asarray(r)
    ts = []
    for _ in range(5):
        t0 = time.time()
        np.asarray(fj(*args))
        ts.append(time.time() - t0)
    t = min(ts)
    total = N * REPS * LOOPS * ops_per_rep
    print(f"{label:44s} {t*1e3:8.2f} ms   {total/t/1e12:7.3f} T ops/s")


def _loop(body, init):
    import jax.lax as lax
    return lax.fori_loop(0, LOOPS, lambda i, a: body(a), init)


def k_mul_u32(x_ref, y_ref, o_ref):
    x, y = x_ref[:], y_ref[:]
    def body(acc):
        for _ in range(REPS):
            acc = acc * y
        return acc + x          # prevent loop-invariant hoisting
    o_ref[:] = _loop(body, x)


def k_mul16_u32(x_ref, y_ref, o_ref):
    # operands masked to 16 bits before each multiply (does Mosaic emit a
    # cheaper 16x16 multiply when it can see the mask?)
    x, y = x_ref[:] & jnp.uint32(0xFFFF), y_ref[:] & jnp.uint32(0xFFFF)
    def body(acc):
        for _ in range(REPS):
            acc = (acc & jnp.uint32(0xFFFF)) * y
        return acc + x
    o_ref[:] = _loop(body, x)


def k_add_u32(x_ref, y_ref, o_ref):
    x, y = x_ref[:], y_ref[:]
    def body(acc):
        for _ in range(REPS):
            acc = acc + y
        return acc ^ x
    o_ref[:] = _loop(body, x)


def k_shift_u32(x_ref, y_ref, o_ref):
    x = x_ref[:]
    def body(acc):
        for _ in range(REPS):
            acc = (acc >> 16) + x
        return acc
    o_ref[:] = _loop(body, x)


def k_madd_split(x_ref, y_ref, o_ref):
    # the real CIOS inner pattern: mul, mask, shift, two adds (5 ops)
    x, y = x_ref[:], y_ref[:]
    def body(c):
        lo, hi = c
        for _ in range(REPS):
            prod = lo * y
            lo = lo + (prod & jnp.uint32(0xFFFF))
            hi = hi + (prod >> 16)
        return (lo, hi)
    lo, hi = _loop(body, (x, y))
    o_ref[:] = lo + hi


def k_mul_f32(x_ref, y_ref, o_ref):
    x, y = x_ref[:], y_ref[:]
    def body(acc):
        for _ in range(REPS):
            acc = acc * y
        return acc + x
    o_ref[:] = _loop(body, x)


def main():
    print(f"devices: {jax.devices()}  N={N} REPS={REPS} LOOPS={LOOPS}")
    x = jnp.asarray(np.random.randint(1, 1 << 16, (N // 128, 128)), jnp.uint32)
    y = jnp.asarray(np.random.randint(1, 1 << 16, (N // 128, 128)), jnp.uint32)
    run("u32 multiply chain", k_mul_u32, x, y)
    run("u32 16-bit-masked multiply chain", k_mul16_u32, x, y, ops_per_rep=2)
    run("u32 add chain", k_add_u32, x, y)
    run("u32 shift+add chain", k_shift_u32, x, y, ops_per_rep=2)
    run("CIOS inner madd (mul+and+shift+2add)", k_madd_split, x, y, ops_per_rep=5)
    xf = x.astype(jnp.float32)
    yf = jnp.asarray(np.random.uniform(0.5, 2.0, (N // 128, 128)), jnp.float32)
    spec = pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
    f = pl.pallas_call(
        k_mul_f32,
        grid=(N // 1024,),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.float32),
    )
    fj = jax.jit(lambda a, b: f(a, b)[:1])
    np.asarray(fj(xf, yf))
    ts = []
    for _ in range(5):
        t0 = time.time()
        np.asarray(fj(xf, yf))
        ts.append(time.time() - t0)
    t = min(ts)
    print(f"{'f32 multiply chain':44s} {t*1e3:8.2f} ms   {N*REPS*LOOPS/t/1e12:7.3f} T ops/s")


if __name__ == "__main__":
    main()
