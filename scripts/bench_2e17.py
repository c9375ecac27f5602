"""End-to-end TurboPlonk prove at the 2^17 SRS ceiling (VERDICT r4 item 6).

The Aztec CRS ceiling makes domain 2^17 a first-class size (reference
src/proof/mod.rs:83-101); round 4 only exercised it at kernel level.  The
engineering problem at 2^17 is HBM: the c=10 signed digit table costs
4.3 GB, which this runtime's usable HBM cannot hold next to the prover's
live set (bench.py:386-388 records the same wall for c=12 at 2^15).  The
resolution measured here: drop the window width to c=8 for this size —
table [129, mp, 32] uint16 = 1.1 GB (the ladder's rung cost scales with
2^(c-1), so halving c quarters the table), paying ~23% more point-adds
(32 windows vs 26).

Run (env set before cap_tpu import; re-execs with PYTHONHASHSEED=0):
    python scripts/bench_2e17.py [reps]
Appends the measured row to docs/SCALING.md by hand — output is JSON.
"""

import json
import os
import sys
import time

os.environ.setdefault("CAP_MSM_C", "8")
if os.environ.get("PYTHONHASHSEED") != "0":
    os.environ["PYTHONHASHSEED"] = "0"
    os.execv(sys.executable, [sys.executable] + sys.argv)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

T0 = time.time()


def log(msg):
    print(f"[2e17 {time.time()-T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def build_chain(target_gates: int):
    from cap_tpu.plonk.circuit import PlonkCircuit

    c = PlonkCircuit()
    x = c.load(7)
    rounds = (target_gates - 16) // 5
    for i in range(rounds):
        x5 = c.mul(c.mul(c.mul(x, x), c.mul(x, x)), x)
        x = c.lc_with_constant([x5, x, c.one, c.one], [1, 1, 0, 0], i)
    c.set_variable_public(x)
    return c


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from cap_tpu.plonk import prover, verifier
    from cap_tpu.proof import universal_setup_for_staging
    from cap_tpu.utils.rng import test_rng

    n_target = 1 << 17
    log(f"CAP_MSM_C={os.environ['CAP_MSM_C']}; building ~{n_target}-gate circuit")
    c = build_chain(n_target - 8)
    fin = c.finalize_for_arithmetization()
    assert fin.n == n_target, fin.n
    log(f"circuit built: n={fin.n}")
    srs = universal_setup_for_staging(n_target + 2, "data")
    log("SRS ready; preprocessing (includes the 2^17 c=8 table build "
        "on a cold table cache)")
    t0 = time.time()
    pk, vk = prover.preprocess(srs, c)
    log(f"preprocess {time.time()-t0:.0f}s")
    rng = test_rng()
    pubs = c.public_input()
    t0 = time.time()
    proof = prover.prove(rng, pk, c.witness_values, pubs)
    warm = time.time() - t0
    log(f"warm-up prove {warm:.1f}s; verifying")
    assert verifier.verify(vk, pubs, proof), "2^17 proof invalid"
    times = []
    for _ in range(reps):
        t0 = time.time()
        prover.prove(rng, pk, c.witness_values, pubs)
        times.append(time.time() - t0)
    log(f"reps: {[round(t, 2) for t in times]}")
    print(json.dumps({
        "metric": "plonk_prove_2e17_seconds",
        "value": round(min(times), 3),
        "unit": "seconds",
        "window_bits": int(os.environ["CAP_MSM_C"]),
        "verify": True,
    }))


if __name__ == "__main__":
    main()
