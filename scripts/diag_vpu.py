"""Diagnose VPU u32 throughput + dispatch floor on this runtime."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(label, fn, reps=10):
    r = fn(); np.asarray(r)
    ts = []
    for _ in range(reps):
        t0 = time.time(); r = fn(); np.asarray(r); ts.append(time.time() - t0)
    print(f"{label:50s} {min(ts)*1e3:9.3f} ms")
    return min(ts)


# 1. dispatch floor
x_small = jnp.ones((8, 128), jnp.uint32)
f_triv = jax.jit(lambda a: a + 1)
timeit("trivial jit dispatch", lambda: f_triv(x_small))

# 2. raw u32 multiply rate: K muls per element, pallas
K = 8192
N = 1 << 18


def mul_kernel(x_ref, o_ref):
    a = x_ref[...]
    acc = a
    for i in range(K):
        acc = acc * a + jnp.uint32(1)
    o_ref[...] = acc


spec = pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)
mul_p = jax.jit(lambda x: pl.pallas_call(
    mul_kernel, grid=(N // 1024,), in_specs=[spec], out_specs=spec,
    out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.uint32))(x)[:1])
xb = jnp.ones((N // 128, 128), jnp.uint32)
t = timeit(f"pallas u32 mul-add chain K={K} N=2^18", lambda: mul_p(xb))
print(f"   -> {N*K/t/1e9:.1f} G u32-mul/s (+adds)")


# 3. same but add/shift/mask mix (mont-like mix: 1 mul : 4 cheap)
def mix_kernel(x_ref, o_ref):
    a = x_ref[...]
    acc = a
    for i in range(K // 4):
        p = acc * a
        acc = (p & jnp.uint32(0xFFFF)) + (p >> 16) + (acc & jnp.uint32(0xFFFF)) + (acc >> 16)
    o_ref[...] = acc


mix_p = jax.jit(lambda x: pl.pallas_call(
    mix_kernel, grid=(N // 1024,), in_specs=[spec], out_specs=spec,
    out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.uint32))(x)[:1])
t = timeit(f"pallas mont-mix chain ({K//4} iters)", lambda: mix_p(xb))
print(f"   -> {N*(K//4)*7/t/1e9:.1f} G u32-op/s")

# 4. f32 fma rate for comparison
def fma_kernel(x_ref, o_ref):
    a = x_ref[...]
    acc = a
    for i in range(K):
        acc = acc * a + 1.0
    o_ref[...] = acc


fma_p = jax.jit(lambda x: pl.pallas_call(
    fma_kernel, grid=(N // 1024,), in_specs=[spec], out_specs=spec,
    out_shape=jax.ShapeDtypeStruct((N // 128, 128), jnp.float32))(x)[:1])
xf = jnp.ones((N // 128, 128), jnp.float32)
t = timeit(f"pallas f32 fma chain K={K}", lambda: fma_p(xf))
print(f"   -> {N*K/t/1e9:.1f} G f32-fma/s")

# 5. int8 matmul MXU rate
A = jnp.ones((8192, 8192), jnp.int8)
B = jnp.ones((8192, 8192), jnp.int8)
mm = jax.jit(lambda a, b: jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                              preferred_element_type=jnp.int32)[:1, :1])
t = timeit("int8 matmul 8192^3 (MXU)", lambda: mm(A, B))
print(f"   -> {2*8192**3/t/1e12:.1f} TOP/s int8")

# 6. bf16 matmul
Ab = jnp.ones((8192, 8192), jnp.bfloat16)
mmb = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32)[:1, :1])
t = timeit("bf16 matmul 8192^3 (MXU)", lambda: mmb(Ab, Ab))
print(f"   -> {2*8192**3/t/1e12:.1f} TFLOP/s bf16")
