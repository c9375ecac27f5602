"""Break quotient_phase's ~175 ms (2^15, warm) into its parts.

Times, each amortized over reps on the real chip:
  1. the 7-poly pad+stack HBM materialization
  2. the batched forward MXU coset NTT at 8n
  3. the fused quotient evaluation kernel
  4. the inverse coset NTT at 8n
  5. the end-to-end quotient_phase for reference

Run: PYTHONHASHSEED=0 python scripts/profile_quotient.py
"""

from __future__ import annotations

import os
import sys
import time

if os.environ.get("PYTHONHASHSEED") != "0":
    os.environ["PYTHONHASHSEED"] = "0"
    os.execv(sys.executable, [sys.executable] + sys.argv)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from cap_tpu.fields.host import FR, NLIMBS
from cap_tpu.ops import field_jax as fj
from cap_tpu.ops.limbs import ints_to_limbs
from cap_tpu.utils.rng import test_rng


def timeit(label, fn, reps=3):
    r = fn()
    jax.block_until_ready(r)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        r = fn()
        jax.block_until_ready(r)
        ts.append(time.time() - t0)
    print(f"{label:46s} {min(ts)*1e3:9.2f} ms", flush=True)
    return min(ts)


def main():
    from cap_tpu import parameters as params
    from cap_tpu.plonk import prover as pv
    from cap_tpu.plonk.srs import universal_setup_for_staging

    rng = test_rng()
    srs = universal_setup_for_staging(2**15 + 2, "data")
    pk = params.load_transfer_proving_key(2, 2, 6).plonk_pk
    pk.srs = srs
    n = pk.n
    m8 = 8 * n
    K = pv._kernels(n)
    mxu = pv._mxu_pack(n)
    from cap_tpu.ops import ntt_mxu as nm

    rnd = lambda k: jnp.asarray(
        np.asarray(ints_to_limbs([FR.rand(rng) for _ in range(k)], FR))
    )
    wire_ext = jnp.stack([rnd(n + 2) for _ in range(5)])
    z_coeffs = rnd(n + 3)
    pub = rnd(27)

    def _pad(c, m):
        return jnp.concatenate(
            [c, jnp.zeros((m - c.shape[0], NLIMBS), jnp.uint32)], axis=0
        )

    @jax.jit
    def stack_only(wire_ext, z_coeffs, pub):
        pi = _pad(pub, n)
        return jnp.stack(
            [_pad(wire_ext[j], m8) for j in range(5)]
            + [_pad(z_coeffs, m8), _pad(pi, m8)]
        )

    stack = stack_only(wire_ext, z_coeffs, pub)
    timeit("pad+stack 7x[8n,16]", lambda: stack_only(wire_ext, z_coeffs, pub))

    fwd = jax.jit(lambda s: nm.ntt_mxu_batch(s, mxu["cos8_fwd"]))
    ev8 = fwd(stack)
    timeit("batched fwd coset NTT 7x 2^18 (MXU)", lambda: fwd(stack))

    from cap_tpu.plonk import phase_kernels as phk

    sc4 = jnp.stack([rnd(1)[0]] * 4)

    @jax.jit
    def quot_eval(ev8, sel, sig, ksx, l1, izh):
        # tables as ARGUMENTS: closure-embedded device arrays exceed the
        # axon remote-compile payload limit (HTTP 413)
        w8 = ev8[:5]
        z8 = ev8[5]
        pi8 = ev8[6]
        zw8 = jnp.roll(z8, -8, axis=0)
        return phk.quotient_eval_pallas(
            w8, z8, zw8, pi8, sel, sig, ksx, l1, izh, sc4,
            fj.FR_CTX.one_mont_np,
        )

    targs = (pk.sel_coset, pk.sigma_coset, pk.ks_x_coset, pk.l1_coset,
             pk.inv_zh_coset)
    t8 = quot_eval(ev8, *targs)
    timeit("quotient eval (pallas, 2^18 lanes)", lambda: quot_eval(ev8, *targs))

    from cap_tpu.ops.ntt import coset_intt

    inv = jax.jit(lambda t: coset_intt(t, K.dom8, K.g, mxu=mxu["cos8_inv"]))
    timeit("inverse coset NTT 2^18 (MXU)", lambda: inv(t8))

    single_fwd = jax.jit(lambda c: nm.ntt_mxu_batch(c[None], mxu["cos8_fwd"])[0])
    timeit("single fwd coset NTT 2^18 (MXU)", lambda: single_fwd(stack[0]))

    qargs = (wire_ext, z_coeffs, pub, pk.sel_coset, pk.sigma_coset,
             pk.ks_x_coset, pk.l1_coset, pk.inv_zh_coset,
             rnd(1)[0], rnd(1)[0], rnd(1)[0],
             mxu["intt_n"], mxu["cos8_fwd"], mxu["cos8_inv"])
    K.quotient_phase(*qargs)
    timeit("quotient_phase end-to-end", lambda: K.quotient_phase(*qargs))


if __name__ == "__main__":
    main()
