"""Benchmark entry point — prints ONE JSON line with the headline metric.

Headline (BASELINE.md): 2-in/2-out transfer-note prove time on one TPU chip
vs multi-threaded asm Rust on a big CPU.  The reference repo publishes no
absolute numbers and Rust is unavailable in this image, so the baseline is
an estimate documented below; `vs_baseline` = baseline_seconds / ours
(>1 means faster than the baseline).

Baseline estimate (BASELINE.md "Grounded Rust baseline estimate"): the
reference prover's work inventory at domain 2^15 priced at arkworks-era
CPU rates gives 0.9-1.8 s (mid 1.35 s) for multi-threaded asm Rust on a
16-64 core x86.  `vs_baseline` uses the midpoint; `vs_baseline_range`
carries both endpoints ([low/ours, high/ours], >1 = faster than that
endpoint).  To be replaced by a measured number once a Rust host exists.

Env knobs:
  CAP_BENCH=transfer|mint|freeze|msm|ntt|field   (default transfer)
  CAP_BENCH_REPS=N                               (default 3)
  CAP_BENCH_DEADLINE=seconds                     (default 1500)

Cold-start policy (round-2 post-mortem: BENCH_r02 rc=124 because the run
paid SRS generation + preprocess + two ~4-min signed-table builds + axon
first-compiles inside the driver budget): the headline path now (a) loads
the stored full-mode transfer proving key (data/*.npz) so preprocess is a
file read, (b) falls back to the windowed-digit MSM engine whenever no
cached signed table exists on disk (its table builds in ~60 s vs ~4 min),
and (c) stops repeating measurements when the soft deadline nears — one
warm measurement is enough for the JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Pin the string-hash seed BEFORE jax loads: the XLA persistent compile
# cache's keys for this repo's pallas programs vary with Python's randomized
# str hash (measured: identical mont_mul_pallas programs MISS every process
# unseeded, HIT with PYTHONHASHSEED=0).  An unpinned bench pays ~700 s of
# axon recompiles per run — the round-2 rc=124 root cause alongside table
# builds.  Re-exec once with the seed pinned.
if os.environ.get("PYTHONHASHSEED") != "0":
    os.environ["PYTHONHASHSEED"] = "0"
    os.execv(sys.executable, [sys.executable] + sys.argv)

T0 = time.time()
DEADLINE = float(os.environ.get("CAP_BENCH_DEADLINE", "1500"))


def time_left() -> float:
    return DEADLINE - (time.time() - T0)


def _log(msg: str) -> None:
    print(f"[bench {time.time()-T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# derived range, BASELINE.md "Grounded Rust baseline estimate" (round 4)
RUST_BASELINE_TRANSFER_RANGE = (0.9, 1.8)
RUST_BASELINE_TRANSFER_S = 1.35          # midpoint
RUST_BASELINE_MINT_S = 0.6               # domain 2^14 ~ half the transfer cost
RUST_BASELINE_FREEZE_S = 0.6
# throughput baseline DERIVED from the same estimate (VERDICT r4 weak #4):
# serial Rust at the 1.35 s midpoint = 0.74 proofs/s (range 0.56-1.11);
# the reference has no cross-proof pipelining (rayon parallelizes WITHIN a
# prove), so serial prove rate is the honest comparator.
RUST_BASELINE_TRANSFER_PPS = 1.0 / RUST_BASELINE_TRANSFER_S
# batch-verify baseline: per-note cost of the reference's folded
# batch_verify = one multi-pairing share (~2 ms amortized) + the per-note
# linearization MSM (~40 points, ~3-10 ms multicore arkworks) ~ 5-15 ms;
# midpoint 10 ms/note (BASELINE.md "derived estimate" framework).
RUST_BASELINE_BATCH_VERIFY_PER_NOTE_S = 0.010


def _pick_msm_window() -> None:
    """Round-5 A/B verdict: c=11 + WCHUNK=1024 (24 windows instead of 26,
    3% pad waste instead of 6%) measured NEUTRAL end-to-end — 1.118 s vs
    1.116 s at the headline shape — because the -8% window-adds are repaid
    by doubled chunk-step count overheads.  c=10/W=2048 stays the default;
    opt in explicitly with CAP_MSM_C / CAP_MSM_WCHUNK."""
    return


def _pick_msm_engine() -> None:
    """Fall back to the windowed MSM when no signed table is cached on disk
    and the deadline can't absorb a ~4-min-per-size signed-table build."""
    if os.environ.get("CAP_MSM"):
        return  # explicit choice wins
    import glob

    from cap_tpu.ops import msm_signed as ms

    tdir = os.environ.get("CAP_MSM_TABLE_DIR", "data/msm_tables")
    cached = glob.glob(os.path.join(tdir, f"signed_v*_c{ms.WINDOW_BITS}_m*.npy"))
    if not cached and time_left() < 1200:
        _log("no cached signed MSM table; falling back to CAP_MSM=windowed")
        os.environ["CAP_MSM"] = "windowed"


def bench_note(kind: str, reps: int):
    _pick_msm_window()  # BEFORE any cap_tpu import (module-level constants)
    from cap_tpu.proof import (
        freeze as fproof,
        mint as mproof,
        transfer as tproof,
        universal_setup_for_staging,
    )
    from cap_tpu.utils.params_builder import (
        FreezeParamsBuilder,
        MintParamsBuilder,
        TransferParamsBuilder,
    )
    from cap_tpu.utils.rng import test_rng

    from cap_tpu import parameters as params

    rng = test_rng()
    # reference bench shape: tree depth 26 (src/bench_utils/mod.rs:40-42);
    # same 2^15 domain as depth 6 for 2-in/2-out, ~6.5k more gates
    depth = 26
    _pick_msm_engine()
    _log(f"loading staging SRS (engine={os.environ.get('CAP_MSM', 'signed')})")
    srs = universal_setup_for_staging(2**15 + 2, "data")
    _log("SRS ready")
    if kind == "transfer":
        # full-mode stored key: loading skips circuit synthesis AND the
        # 18-poly commit batch (parameters.py); fresh preprocess only on a
        # cold checkout, and then the key is stored for the next run.
        try:
            pk = params.load_transfer_proving_key(2, 2, depth)
        except Exception:
            _log("no stored transfer pk; preprocessing (one-time)")
            pk, _vk = tproof.preprocess(srs, 2, 2, depth)
            try:
                params.store_transfer_proving_key(pk, 2, 2, depth, mode="full")
            except Exception as e:
                _log(f"pk store failed (non-fatal): {e}")
        _log("transfer pk ready")
        # parallel program warm-up: pre-dispatch every per-round program
        # (threads) while the signed table loads/uploads — the sequential
        # first-prove warm-up paid ~850 s of serial per-program setup
        from cap_tpu.plonk.warm import warm_prover

        dt = warm_prover(pk.plonk_pk, srs, verbose=True)
        _log(f"prover programs warm ({dt:.0f}s)")
        builder = lambda: TransferParamsBuilder(rng, 2, 2, depth, non_native=True,
                                                with_viewer=True)
        gen = lambda b: b.build_transfer_note(pk)[0]
        baseline = RUST_BASELINE_TRANSFER_S
        metric = "transfer_2in2out_prove_seconds"
    elif kind == "mint":
        pk, vk = mproof.preprocess(srs, depth)
        builder = lambda: MintParamsBuilder(rng, depth, with_viewer=True)
        gen = lambda b: b.build_mint_note(pk)[0]
        baseline = RUST_BASELINE_MINT_S
        metric = "mint_prove_seconds"
    else:
        pk, vk = fproof.preprocess(srs, 2, depth)
        builder = lambda: FreezeParamsBuilder(rng, 2, depth)
        gen = lambda b: b.build_freeze_note(pk)[0]
        baseline = RUST_BASELINE_FREEZE_S
        metric = f"{kind}_prove_seconds"

    t0 = time.time()
    gen(builder())  # warm-up (compile)
    warm = time.time() - t0
    _log(f"warm-up prove done ({warm:.1f}s); measuring")
    times = []
    for _ in range(reps):
        if times and time_left() < max(60.0, 2.5 * times[-1]):
            _log(f"deadline near; stopping after {len(times)} reps")
            break
        b = builder()
        t0 = time.time()
        gen(b)
        times.append(time.time() - t0)
    best = min(times) if times else warm
    out = {
        "metric": metric,
        "value": round(best, 3),
        "unit": "seconds",
        "vs_baseline": round(baseline / best, 3),
    }
    if kind == "transfer":
        lo, hi = RUST_BASELINE_TRANSFER_RANGE
        out["vs_baseline_range"] = [round(lo / best, 3), round(hi / best, 3)]
    return out


def bench_field(reps: int):
    import jax.numpy as jnp
    import numpy as np

    from cap_tpu.fields.host import FR
    from cap_tpu.ops import field_jax as fj
    from cap_tpu.ops.limbs import ints_to_limbs
    from cap_tpu.utils.rng import test_rng

    rng = test_rng()
    n = 1 << 18
    base = ints_to_limbs([FR.rand(rng) for _ in range(4096)], FR)
    X = jnp.asarray(np.tile(base, (n // 4096, 1)))
    f = jax.jit(fj.mont_mul)
    Z = f(X, X)
    Z.block_until_ready()
    t0 = time.time()
    iters = 20
    for _ in range(iters):
        Z = f(Z, X)
    Z.block_until_ready()
    per = (time.time() - t0) / iters
    mps = n / per / 1e6
    # speed-of-light roofline: ~500 uint32 ops per modmul on the VPU
    return {
        "metric": "field_mont_mul_mops_per_s",
        "value": round(mps, 1),
        "unit": "Mmul/s",
        "vs_baseline": round(mps / 100.0, 2),  # vs ~100 Mmul/s asm x86 core
    }


def bench_ntt(reps: int):
    import jax.numpy as jnp
    import numpy as np

    from cap_tpu.fields.host import FR
    from cap_tpu.ops import ntt as nt
    from cap_tpu.ops.limbs import ints_to_limbs
    from cap_tpu.utils.rng import test_rng

    rng = test_rng()
    n = 1 << 15
    dom = nt.get_domain(n)
    C = jnp.asarray(ints_to_limbs([FR.rand(rng) for _ in range(n)], FR))
    f = jax.jit(lambda c: nt.ntt(c, dom))
    E = f(C)
    jax.block_until_ready(E)
    t0 = time.time()
    iters = 50
    for _ in range(iters):
        E = f(C)
    jax.block_until_ready(E)
    per = (time.time() - t0) / iters
    return {
        "metric": "ntt_2e15_ms",
        "value": round(per * 1e3, 3),
        "unit": "ms",
        "vs_baseline": round(10.0 / (per * 1e3), 2),  # vs ~10ms multicore CPU FFT
    }


def bench_msm(reps: int):
    from cap_tpu.crypto.bn254 import G1_GEN, g1_mul
    from cap_tpu.fields.host import FR
    from cap_tpu.ops import msm
    from cap_tpu.utils.rng import test_rng

    rng = test_rng()
    n = 1 << 15
    pts = [g1_mul(G1_GEN, FR.rand(rng)) for _ in range(64)] * (n // 64)
    scal = [FR.rand(rng) for _ in range(n)]
    Pd, Sd = msm.pad_msm_inputs(pts, scal)
    f = jax.jit(msm.msm_device)
    jax.block_until_ready(f(Pd, Sd))
    t0 = time.time()
    for _ in range(reps):
        t_bits = f(Pd, Sd)
        jax.block_until_ready(t_bits)
    per = (time.time() - t0) / reps
    return {
        "metric": "msm_2e15_seconds",
        "value": round(per, 3),
        "unit": "seconds",
        "vs_baseline": round(0.15 / per, 2),  # vs ~150ms multicore CPU pippenger
    }


def bench_batch_verify(reps: int):
    """Mixed-type batch verification (benches/batch_verification.rs twin)."""
    from cap_tpu.lib import TransactionNote, txn_batch_verify
    from cap_tpu.proof import (
        freeze as fproof, mint as mproof, transfer as tproof,
        universal_setup_for_staging,
    )
    from cap_tpu.utils.params_builder import (
        FreezeParamsBuilder, MintParamsBuilder, TransferParamsBuilder,
    )
    from cap_tpu.utils.rng import test_rng

    rng = test_rng()
    depth = 6
    srs = universal_setup_for_staging(2**15 + 2, "data")
    notes, roots, vks = [], [], []
    mpk, mvk = mproof.preprocess(srs, depth)
    mb = MintParamsBuilder(rng, depth)
    n, *_ = mb.build_mint_note(mpk)
    notes.append(TransactionNote.mint(n)); roots.append(mb.tree.root); vks.append(mvk)
    tpk, tvk = tproof.preprocess(srs, 2, 2, depth)
    tb = TransferParamsBuilder(rng, 2, 2, depth)
    n, *_ = tb.build_transfer_note(tpk)
    notes.append(TransactionNote.transfer(n)); roots.append(tb.tree.root); vks.append(tvk)
    fpk, fvk = fproof.preprocess(srs, 2, depth)
    fb = FreezeParamsBuilder(rng, 2, depth)
    n, *_ = fb.build_freeze_note(fpk)
    notes.append(TransactionNote.freeze(n)); roots.append(fb.tree.root); vks.append(fvk)
    txn_batch_verify(notes, roots, 5, vks)  # warm
    t0 = time.time()
    for _ in range(reps):
        txn_batch_verify(notes, roots, 5, vks)
    per = (time.time() - t0) / reps
    return {
        "metric": "mixed_batch_verify_3notes_seconds",
        "value": round(per, 3),
        "unit": "seconds",
        "vs_baseline": round(
            RUST_BASELINE_BATCH_VERIFY_PER_NOTE_S / (per / 3), 3
        ),
    }


def bench_throughput(reps: int):
    """Pipelined multi-proof throughput on one chip (parallel/queue.py):
    host witness prep of note i+1 overlaps device proving of note i.
    Metric: transfer proofs/s over a queue of `reps`+1 notes (first is
    warm-up).  Baseline: serial Rust at the derived 1.35 s midpoint
    (RUST_BASELINE_TRANSFER_PPS; BASELINE.md)."""
    _pick_msm_window()
    from cap_tpu.parallel.queue import (
        assemble_transfer_notes, prove_pipelined, transfer_note_task,
    )
    from cap_tpu.proof import transfer as tproof, universal_setup_for_staging
    from cap_tpu.structs import FeeInput, TxnFeeInfo
    from cap_tpu.transfer import TransferNote
    from cap_tpu.utils.params_builder import TransferParamsBuilder

    from cap_tpu import parameters as params

    depth = 6
    _pick_msm_engine()
    srs = universal_setup_for_staging(2**15 + 2, "data")
    try:
        # stored full-mode key: same cold-start path as the headline mode
        pk = params.load_transfer_proving_key(2, 2, depth)
    except Exception:
        pk, _vk = tproof.preprocess(srs, 2, 2, depth)
    from cap_tpu.plonk.warm import warm_prover

    dt = warm_prover(pk.plonk_pk, srs, verbose=True)
    _log(f"prover programs warm ({dt:.0f}s)")

    def build_prepare(rng):
        b = TransferParamsBuilder(rng, 2, 2, depth, non_native=True,
                                  with_viewer=True)
        inputs, outputs = b.build_inputs_and_outputs()
        fee_input = FeeInput(b.fee_ro, inputs[0].acc_member_witness, b.users[0])
        fee_info, _ = TxnFeeInfo.new(rng, fee_input, b.fee)
        prep = TransferNote.prepare_non_native(
            rng, inputs[1:], outputs, fee_info, b.valid_until, pk
        )
        return prep

    def make_tasks(n, base):
        return [
            transfer_note_task(f"n{base+i}", base + i, pk, build_prepare)
            for i in range(n)
        ]

    prove_pipelined(make_tasks(1, 100))  # warm-up (compile + tape)
    n = max(reps, 3)
    t0 = time.time()
    results = prove_pipelined(make_tasks(n, 200))
    wall = time.time() - t0
    notes = assemble_transfer_notes(results)
    assert len(notes) == n
    pps = n / wall
    return {
        "metric": "transfer_pipelined_proofs_per_s",
        "value": round(pps, 3),
        "unit": "proofs/s",
        "vs_baseline": round(pps / RUST_BASELINE_TRANSFER_PPS, 3),
    }


def bench_grid(reps: int):
    """The reference criterion grid at depth 26 (bench_utils.run_grid);
    emits the CSV to /tmp/cap_tpu_benchmark.csv and a summary JSON line."""
    import csv
    import io

    from cap_tpu.bench_utils import run_grid

    out = run_grid()
    rows = list(csv.DictReader(io.StringIO(out)))
    t22 = next(
        (r for r in rows
         if r["TRANSACTION"] == "TRANSFER" and r["FUNCTION"] == "generate"
         and r["N_INPUTS"] == "2" and r["N_OUTPUTS"] == "2"),
        None,
    )
    val = float(t22["TIME_MS"]) / 1e3 if t22 else 0.0
    return {
        "metric": "transfer_2in2out_depth26_prove_seconds",
        "value": round(val, 3),
        "unit": "seconds",
        "vs_baseline": round(RUST_BASELINE_TRANSFER_S / val, 3) if val else 0.0,
    }


def main():
    kind = os.environ.get("CAP_BENCH", "transfer")
    reps = int(os.environ.get("CAP_BENCH_REPS", "3"))
    # async device-transcript prover by default: byte-identical proofs
    # (scripts/probe_async.py), ~60 ms faster per prove (one host sync)
    os.environ.setdefault("CAP_ASYNC", "1")
    # MSM window width stays at the library default c=10.  c=12 was tried
    # for single-shape runs (-15% point adds) but its 4.3 GB digit table
    # next to the prover's live set exhausts this runtime's usable HBM —
    # the commit program OOMs at 2^15 (measured twice, classic and fused).
    if kind in ("transfer", "mint", "freeze"):
        result = bench_note(kind, reps)
    elif kind == "batch_verify":
        result = bench_batch_verify(reps)
    elif kind == "throughput":
        result = bench_throughput(reps)
    elif kind == "field":
        result = bench_field(reps)
    elif kind == "ntt":
        result = bench_ntt(reps)
    elif kind == "msm":
        result = bench_msm(reps)
    elif kind == "grid":
        result = bench_grid(reps)
    else:
        raise SystemExit(f"unknown CAP_BENCH={kind}")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
