"""On-chip equality + timing probe for the batch-affine MSM engine.

Round-5 verdict (measured, see docs/STATUS.md): the engine is CORRECT
(matches the signed engine on real-SRS columns for k=1/5, all edge cases
— identity, doubling, cancellation, negation — plus host ground truth),
but SLOWER on this hardware: the marginal per-lane rate is only ~1.2x
better than the projective signed engine (41 vs 50 ms per poly at 2^15)
while the per-chunk-step fixed costs (batched-inversion glue) multiply by
the 17 chunk steps.  Kept as CAP_MSM=affine for future tuning; the signed
engine stays the default.

NOTE: comparing the engines with random scalars over the FULL padded table
is invalid — columns beyond srs.num_points hold garbage ladder rows from
the fake (0,1) pad base, where affine-chord and projective-complete
addition legitimately differ.  Real commits zero those columns (srs_pad).

Run on the chip: python scripts/probe_affine.py
"""

import os
import random
import sys
import time

if os.environ.get("PYTHONHASHSEED") != "0":
    os.environ["PYTHONHASHSEED"] = "0"
    os.execv(sys.executable, [sys.executable] + sys.argv)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp

from cap_tpu.fields.host import FR
from cap_tpu.ops import msm_affine as aff, msm_signed as msg
from cap_tpu.ops.msm import scalars_to_device
from cap_tpu.plonk import prover as pv
from cap_tpu.proof import universal_setup_for_staging


def main():
    srs = universal_setup_for_staging(2**15 + 2, "data")
    tab = pv.signed_table(srs, 2**15 + 3)
    mp = tab.shape[1]
    real = min(mp, srs.num_points)
    rnd = random.Random(11)

    def mk(k):
        return jnp.stack([
            scalars_to_device(
                [rnd.randrange(FR.p) for _ in range(real)] + [0] * (mp - real)
            )
            for _ in range(k)
        ])

    aff_jit = jax.jit(aff.msm_affine_commit_device)
    sig_jit = jax.jit(msg.msm_signed_commit_device)
    for k in (1, 5):
        sc = mk(k)
        pa = msg.points_from_batch_result(np.asarray(aff_jit(tab, sc)))
        ps = msg.points_from_batch_result(np.asarray(sig_jit(tab, sc)))
        assert pa == ps, f"k={k} affine != signed"
        print(f"k={k}: affine == signed OK")
        for name, f in (("affine", aff_jit), ("signed", sig_jit)):
            ts = []
            for _ in range(5):
                t0 = time.time()
                np.asarray(f(tab, sc))
                ts.append(time.time() - t0)
            print(f"  k={k} {name}: median {sorted(ts)[2]*1e3:.1f} ms")


if __name__ == "__main__":
    main()
