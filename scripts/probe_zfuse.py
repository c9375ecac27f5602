"""A/B probe: fused lane-major prefix product vs the shift-ladder.

Round-4 lever 3 (docs/STATUS.md): z_phase spends ~47 ms in 30 full-array
shift-ladder multiplies (prefix(num) + suffix(den)).  The fused kernels
(ops/pallas_field.py prefix_prod_fused) cut multiplies/element from
log2(n)=15 to ~log2(32)+2=7 and HBM round trips from 30 to 4.

Run on the TPU chip:  python scripts/probe_zfuse.py  [n]
Prints correctness (exact match vs field_jax.prefix_prod) and timings.
"""

import os
import sys
import time

if os.environ.get("PYTHONHASHSEED") != "0":
    os.environ["PYTHONHASHSEED"] = "0"
    os.execv(sys.executable, [sys.executable] + sys.argv)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from cap_tpu.fields.host import FR
from cap_tpu.ops import field_jax as fj, pallas_field as pfl
from cap_tpu.ops.limbs import ints_to_limbs
from cap_tpu.utils.rng import test_rng


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 15
    rng = test_rng()
    base = ints_to_limbs([FR.rand(rng) for _ in range(4096)], FR)
    x = jnp.asarray(np.tile(base, (n // 4096, 1)))
    y = jnp.asarray(np.tile(base[::-1].copy(), (n // 4096, 1)))

    fmul = pfl.mont_mul_pallas if pfl.use_pallas() else None

    @jax.jit
    def ladder(a, b):
        return (fj.prefix_prod(a, mul=fmul), fj.suffix_prod(b, mul=fmul))

    @jax.jit
    def fused(a, b):
        return (pfl.prefix_prod_fused(a), pfl.suffix_prod_fused(b))

    pl_, sl = jax.block_until_ready(ladder(x, y))
    t0 = time.time()
    pf, sf = jax.block_until_ready(fused(x, y))
    print(f"fused compile+run: {time.time()-t0:.1f}s")
    ok_p = bool(jnp.all(pl_ == pf))
    ok_s = bool(jnp.all(sl == sf))
    print(f"prefix exact match: {ok_p}   suffix exact match: {ok_s}")

    # FQ context: _batch_inverse (msm_signed.py) runs the fused kernels over
    # FQ_CTX during signed-table builds — equality-check that field too
    # (ADVICE r4 low: only FR was checked on chip before).
    from cap_tpu.fields.host import FQ

    xq = jnp.asarray(ints_to_limbs([FQ.rand(rng) for _ in range(4096)], FQ))
    xq = jnp.tile(xq, (n // 4096, 1))

    @jax.jit
    def ladder_q(a):
        return fj.prefix_prod(a, fj.FQ_CTX)

    @jax.jit
    def fused_q(a):
        return pfl.prefix_prod_fused(a, fj.FQ_CTX)

    ok_q = bool(jnp.all(jax.block_until_ready(ladder_q(xq))
                        == jax.block_until_ready(fused_q(xq))))
    print(f"FQ prefix exact match: {ok_q}")
    if not ok_q:
        raise SystemExit(1)
    if not (ok_p and ok_s):
        bad = int(jnp.argmax(jnp.any(pl_ != pf, axis=1)))
        print("first prefix mismatch row:", bad)
        print("ladder:", np.asarray(pl_[bad]))
        print("fused :", np.asarray(pf[bad]))
        raise SystemExit(1)

    reps = 30
    for name, fn in (("ladder", ladder), ("fused", fused)):
        jax.block_until_ready(fn(x, y))
        t0 = time.time()
        for _ in range(reps):
            out = fn(x, y)
        jax.block_until_ready(out)
        per = (time.time() - t0) / reps
        print(f"{name:8s} prefix+suffix @ n={n}: {per*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
