"""Interactive warm-prover session for kernel iteration (round 5).

Run under `python -i` in tmux: loads the staging SRS, the stored depth-26
2-in/2-out transfer proving key and the 2^15 signed table, runs one warm
prove, and leaves everything in globals for interactive measurement:

    srs, pk, builder_fn(), prove_once() -> seconds

Holding the TPU: only one process can own the axon chip — close this
before running bench.py.
"""

import os
import sys
import time

if os.environ.get("PYTHONHASHSEED") != "0":
    os.environ["PYTHONHASHSEED"] = "0"
    os.execv(sys.executable, [sys.executable] + sys.argv)

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

T0 = time.time()


def log(msg):
    print(f"[warm {time.time()-T0:7.1f}s] {msg}", flush=True)


from cap_tpu import parameters as params
from cap_tpu.proof import transfer as tproof, universal_setup_for_staging
from cap_tpu.utils.params_builder import TransferParamsBuilder
from cap_tpu.utils.rng import test_rng

rng = test_rng()
DEPTH = 26
log("loading staging SRS")
srs = universal_setup_for_staging(2**15 + 2, "data")
log("SRS ready; loading transfer pk")
pk = params.load_transfer_proving_key(2, 2, DEPTH)
log("pk ready")


def builder_fn():
    return TransferParamsBuilder(rng, 2, 2, DEPTH, non_native=True,
                                 with_viewer=True)


def prove_once(b=None):
    b = b or builder_fn()
    t0 = time.time()
    b.build_transfer_note(pk)
    return time.time() - t0


log("warm-up prove (compiles + table upload)...")
t = prove_once()
log(f"warm-up prove: {t:.2f}s")
for i in range(2):
    log(f"rep: {prove_once():.3f}s")
log("READY — interactive.  prove_once() for a timed prove.")
