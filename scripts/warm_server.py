"""Warm-prover command server for kernel iteration (round 5, no tmux).

Loads SRS + pk + signed table, runs a warm prove, then polls
/tmp/capq/job_*.py; each job file is exec'd in this process's globals
(so `srs`, `pk`, `prove_once`, jax, etc. are available), stdout captured
to /tmp/capq/job_*.out with .done marker.  Stop with /tmp/capq/STOP.
"""

import io
import contextlib
import glob
import os
import sys
import time
import traceback

# NOTE: setdefault is NOT enough — the interpreter's str hash seed is fixed
# at startup, so the env var must be set BEFORE python launches (re-exec).
# A setdefault version of this ran the round-5 warm server with a random
# seed and recompiled every program under throwaway cache keys.
if os.environ.get("PYTHONHASHSEED") != "0":
    os.environ["PYTHONHASHSEED"] = "0"
    os.execv(sys.executable, [sys.executable] + sys.argv)

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

T0 = time.time()
QDIR = "/tmp/capq"
os.makedirs(QDIR, exist_ok=True)


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
log("READY — polling %s for job_*.py" % QDIR)

while True:
    if os.path.exists(os.path.join(QDIR, "STOP")):
        log("STOP seen; exiting")
        break
    jobs = sorted(glob.glob(os.path.join(QDIR, "job_*.py")))
    for j in jobs:
        done = j + ".done"
        outp = j + ".out"
        if os.path.exists(done):
            continue
        log(f"running {os.path.basename(j)}")
        buf = io.StringIO()
        try:
            src = open(j).read()
            with contextlib.redirect_stdout(buf):
                exec(compile(src, j, "exec"), globals())
        except Exception:
            buf.write(traceback.format_exc())
        with open(outp, "w") as f:
            f.write(buf.getvalue())
        open(done, "w").close()
        log(f"done {os.path.basename(j)}")
    time.sleep(0.5)
