"""Benchmark reporting with the reference's CSV schema
(reference src/bench_utils/mod.rs twin, SURVEY.md §5 "Metrics").

Emits rows with the columns the reference post-processes from criterion:
TRANSACTION, N_THREADS, FUNCTION, N_INPUTS, N_OUTPUTS, TREE_HEIGHT,
DOMAIN_SIZE, N_CONSTRAINTS, UTILITY_RATIO(%), NOTE SIZE (KB),
PROVING KEY SIZE (KB), VERIFYING KEY SIZE (KB), TIME (ms)
— with N_THREADS generalized to the device description.

Reference bench grid: n_inputs in {2,3,4} x n_outputs in {2,5}, depth 26
(bench_utils/mod.rs:40-42); mint and freeze grids from benches/{mint,
freeze}.rs; batch verification {1,2,4} notes x type plus mixed batches
(benches/batch_verification.rs:40-51).
"""

from __future__ import annotations

import csv
import io
import time

NUM_INPUTS_RANGE = (2, 3, 4)
NUM_OUTPUTS_RANGE = (2, 5)
TREE_DEPTH = 26  # 3^26 ~ 2.5e12 leaves, the reference's benchmark depth

CSV_HEADER = [
    "TRANSACTION", "DEVICE", "FUNCTION", "N_INPUTS", "N_OUTPUTS",
    "TREE_HEIGHT", "DOMAIN_SIZE", "N_CONSTRAINTS", "UTILITY_RATIO(%)",
    "NOTE_SIZE_KB", "PK_SIZE_KB", "VK_SIZE_KB", "TIME_MS",
]


def device_description() -> str:
    import jax

    d = jax.devices()[0]
    return f"{d.platform}:{getattr(d, 'device_kind', '?')}x{len(jax.devices())}"


def _vk_bytes(vk) -> int:
    return len(vk.plonk_vk.to_bytes()) + 24


def _pk_bytes(pk) -> int:
    """Full-mode stored size estimate: the arrays parameters.py persists."""
    import numpy as np

    ppk = pk.plonk_pk
    total = 0
    for arr in (ppk.sel_coeffs, ppk.sigma_coeffs):
        total += np.asarray(arr).nbytes
    total += np.asarray(ppk.wire_index).nbytes
    return total


def bench_row(kind: str, fn_name: str, n_in: int, n_out: int, depth: int,
              domain: int, gates: int, note_bytes: int, pk_bytes: int,
              vk_bytes: int, seconds: float) -> list:
    return [
        kind, device_description(), fn_name, n_in, n_out, depth,
        domain, gates, round(100.0 * gates / domain, 1) if domain else 0,
        round(note_bytes / 1024, 2), round(pk_bytes / 1024, 2),
        round(vk_bytes / 1024, 2), round(seconds * 1e3, 1),
    ]


def rows_to_csv(rows) -> str:
    buf = io.StringIO()
    w = csv.writer(buf)
    w.writerow(CSV_HEADER)
    for r in rows:
        w.writerow(r)
    return buf.getvalue()


def _time_once(fn):
    t0 = time.time()
    out = fn()
    return out, time.time() - t0



def _cached_keys(kind, preprocess_fn, store_args, load_args):
    """Grid preprocess is a load on reruns (reference parameters.rs role:
    regenerating keys per run is the single longest grid stage)."""
    from cap_tpu import parameters as params

    try:
        pk = {
            "transfer": params.load_transfer_proving_key,
            "mint": params.load_mint_proving_key,
            "freeze": params.load_freeze_proving_key,
        }[kind](*load_args)
        vk = params.load_verifying_key(kind, *store_args)
        return pk, vk
    except Exception:
        pass
    pk, vk = preprocess_fn()
    try:
        {
            "transfer": params.store_transfer_proving_key,
            "mint": params.store_mint_proving_key,
            "freeze": params.store_freeze_proving_key,
        }[kind](pk, *load_args, mode="full")
        params.store_verifying_key(vk, kind, *store_args)
    except Exception:
        pass  # cache write failure is never fatal to the grid
    return pk, vk


def run_grid(out_path: str = "/tmp/cap_tpu_benchmark.csv",
             depth: int = TREE_DEPTH,
             transfer_shapes=tuple((i, o) for i in NUM_INPUTS_RANGE
                                   for o in NUM_OUTPUTS_RANGE),
             mint: bool = True,
             freeze_inputs=(2, 3),
             batch_sizes=(1, 2, 4),
             srs_degree: int = 2**17 + 2,
             samples: int = 3,
             progress=print):
    """The reference criterion grid: Gen+Verify per shape per family, plus
    batch-verification rows.  Writes (and returns) the CSV.

    Matches benches/{transfer,mint,freeze,batch_verification}.rs at the
    reference's depth-26 tree; each shape costs one preprocess (Python
    circuit synthesis + device compiles), then `samples` warm runs are
    timed and the MEDIAN is reported (>=3 samples/cell per VERDICT r3 —
    single contended samples don't ship in the comparable artifact).
    """
    import statistics

    def _time_med(fn, k=samples):
        vals, res = [], None
        for _ in range(max(1, k)):
            res, t = _time_once(fn)
            vals.append(t)
        return res, statistics.median(vals)
    from cap_tpu import lib as cap_lib
    from cap_tpu.proof import (
        freeze as fproof,
        mint as mproof,
        transfer as tproof,
        universal_setup_for_staging,
    )
    from cap_tpu.utils.note_serde import transaction_note_to_bytes
    from cap_tpu.utils.params_builder import (
        FreezeParamsBuilder,
        MintParamsBuilder,
        TransferParamsBuilder,
    )
    from cap_tpu.utils.rng import test_rng

    rng = test_rng()
    rows = []
    srs = universal_setup_for_staging(srs_degree, "data")
    batch_notes = []  # (note, vk, root) for batch rows

    for (n_in, n_out) in transfer_shapes:
        progress(f"[grid] transfer {n_in}-in/{n_out}-out depth {depth}: preprocess")
        pk, vk = _cached_keys(
            "transfer", lambda: tproof.preprocess(srs, n_in, n_out, depth),
            (n_in, n_out, depth), (n_in, n_out, depth),
        )
        domain, gates = pk.plonk_pk.n, getattr(pk.plonk_pk, "num_gates", 0)
        mk = lambda: TransferParamsBuilder(
            rng, n_in, n_out, depth, non_native=True, with_viewer=True
        )
        b = mk()
        note, _, _ = b.build_transfer_note(pk)  # warm (tape + compiles)
        def _gen_transfer():
            b2 = mk()
            note2, _, _ = b2.build_transfer_note(pk)
            return (note2, b2)
        (note2, b2), gen_s = _time_med(_gen_transfer)
        ok, ver_s = _time_med(
            lambda: note2.verify(vk, b2.tree.root, timestamp=5)
        )
        assert ok is not False  # note verify raises on failure
        nb = len(transaction_note_to_bytes(note2))
        args = (n_in, n_out, depth, domain, gates, nb, _pk_bytes(pk), _vk_bytes(vk))
        rows.append(bench_row("TRANSFER", "generate", *args, gen_s))
        rows.append(bench_row("TRANSFER", "verify", *args, ver_s))
        progress(f"[grid] transfer {n_in}x{n_out}: domain {domain}, "
                 f"gen {gen_s:.2f}s, verify {ver_s:.3f}s")
        if (n_in, n_out) == (2, 2):
            batch_notes.append((note2, vk, b2.tree.root))

    if mint:
        progress(f"[grid] mint depth {depth}: preprocess")
        pk, vk = _cached_keys(
            "mint", lambda: mproof.preprocess(srs, depth),
            (1, 2, depth), (depth,),
        )
        domain, gates = pk.plonk_pk.n, getattr(pk.plonk_pk, "num_gates", 0)
        b = MintParamsBuilder(rng, tree_depth=depth, with_viewer=True)
        note, *_rest = b.build_mint_note(pk)
        def _gen_mint():
            b2 = MintParamsBuilder(rng, tree_depth=depth, with_viewer=True)
            return (b2.build_mint_note(pk)[0], b2)
        (note2, b2), gen_s = _time_med(_gen_mint)
        ok, ver_s = _time_med(lambda: note2.verify(vk, b2.tree.root))
        assert ok is not False
        nb = len(transaction_note_to_bytes(note2))
        args = (1, 2, depth, domain, gates, nb, _pk_bytes(pk), _vk_bytes(vk))
        rows.append(bench_row("MINT", "generate", *args, gen_s))
        rows.append(bench_row("MINT", "verify", *args, ver_s))
        progress(f"[grid] mint: domain {domain}, gen {gen_s:.2f}s")
        batch_notes.append((note2, vk, b2.tree.root))

    for n_in in freeze_inputs:
        progress(f"[grid] freeze {n_in}-in depth {depth}: preprocess")
        pk, vk = _cached_keys(
            "freeze", lambda: fproof.preprocess(srs, n_in, depth),
            (n_in, n_in, depth), (n_in, depth),
        )
        domain, gates = pk.plonk_pk.n, getattr(pk.plonk_pk, "num_gates", 0)
        b = FreezeParamsBuilder(rng, n_inputs=n_in, tree_depth=depth)
        note, *_rest = b.build_freeze_note(pk)
        def _gen_freeze():
            b2 = FreezeParamsBuilder(rng, n_inputs=n_in, tree_depth=depth)
            return (b2.build_freeze_note(pk)[0], b2)
        (note2, b2), gen_s = _time_med(_gen_freeze)
        ok, ver_s = _time_med(lambda: note2.verify(vk, b2.tree.root))
        assert ok is not False
        nb = len(transaction_note_to_bytes(note2))
        args = (n_in, n_in, depth, domain, gates, nb, _pk_bytes(pk), _vk_bytes(vk))
        rows.append(bench_row("FREEZE", "generate", *args, gen_s))
        rows.append(bench_row("FREEZE", "verify", *args, ver_s))
        progress(f"[grid] freeze {n_in}-in: domain {domain}, gen {gen_s:.2f}s")
        if n_in == 2:
            batch_notes.append((note2, vk, b2.tree.root))

    # batch verification rows (mixed-type batch repeated to each size)
    if batch_sizes and batch_notes:
        notes = [n for (n, _, _) in batch_notes]
        vks = [v for (_, v, _) in batch_notes]
        roots = [r for (_, _, r) in batch_notes]
        for bs in batch_sizes:
            sel = [(notes[i % len(notes)], vks[i % len(vks)], roots[i % len(roots)])
                   for i in range(bs)]
            _, t = _time_med(lambda: cap_lib.txn_batch_verify(
                [s[0] for s in sel], [s[2] for s in sel], 5,
                [s[1] for s in sel],
            ))  # raises on failure
            rows.append(bench_row("BATCH_VERIFY", f"batch_{bs}", bs, bs, depth,
                                  0, 0, 0, 0, 0, t))
            progress(f"[grid] batch_verify x{bs}: {t:.3f}s")

    out = rows_to_csv(rows)
    with open(out_path, "w") as f:
        f.write(out)
    return out
