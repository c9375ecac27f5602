"""On-chip validation of the async device-transcript prover.

Asserts the CAP_ASYNC=1 prove produces BYTE-IDENTICAL proofs to the sync
per-round prover for the same rng stream (same blinds, same transcript
math — the device SolidityTranscript twin is exact), verifies with the
host verifier, and times both variants at the headline shape.

Run on the chip: python scripts/probe_async.py
First run compiles the 4 async round programs (tens of minutes on axon;
cached afterwards).
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

T0 = time.time()


def log(m):
    print(f"[async {time.time()-T0:7.1f}s] {m}", flush=True)


def main():
    from cap_tpu import parameters as params
    from cap_tpu.proof import universal_setup_for_staging
    from cap_tpu.utils.params_builder import TransferParamsBuilder
    from cap_tpu.utils.rng import test_rng

    srs = universal_setup_for_staging(2**15 + 2, "data")
    pk = params.load_transfer_proving_key(2, 2, 26)
    log("pk ready; warming programs")
    from cap_tpu.plonk.warm import warm_prover

    warm_prover(pk.plonk_pk, srs, verbose=True)
    rng = test_rng()

    def build(mode):
        # fresh deterministic rng per build: identical witness AND blinds
        # across the sync/async pair, so proof bytes must match exactly
        os.environ["CAP_ASYNC"] = mode
        b = TransferParamsBuilder(test_rng(), 2, 2, 26,
                                  non_native=True, with_viewer=True)
        t0 = time.time()
        note, _, _ = b.build_transfer_note(pk)
        dt = time.time() - t0
        return note, dt, b

    note_s, t_sync0, b_s = build("0")
    log(f"sync prove (warm-up path): {t_sync0:.2f}s")
    note_a, t_async0, b_a = build("1")
    log(f"async prove (first call, compiles): {t_async0:.2f}s")

    ps = note_s.proof.to_bytes()
    pa = note_a.proof.to_bytes()
    match = ps == pa
    log(f"proof bytes identical: {match}")
    if not match:
        import hashlib

        log(f"sync  {hashlib.sha256(ps).hexdigest()[:16]}")
        log(f"async {hashlib.sha256(pa).hexdigest()[:16]}")
        raise SystemExit(1)
    vk = params.load_verifying_key("transfer", 2, 2, 26)
    note_a.verify(vk, note_a.aux_info.merkle_root, 0)
    log("async proof verifies")

    for mode, name in (("0", "sync"), ("1", "async")):
        os.environ["CAP_ASYNC"] = mode
        ts = []
        for _ in range(3):
            _, dt, _ = build(mode)
            ts.append(dt)
        log(f"{name}: reps {[round(x, 3) for x in ts]}  best {min(ts):.3f}s")


if __name__ == "__main__":
    main()
