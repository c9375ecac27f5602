"""Benchmark reporting with the reference's CSV schema
(reference src/bench_utils/mod.rs twin, SURVEY.md §5 "Metrics").

Emits rows with the columns the reference post-processes from criterion:
TRANSACTION, N_THREADS, FUNCTION, N_INPUTS, N_OUTPUTS, TREE_HEIGHT,
DOMAIN_SIZE, N_CONSTRAINTS, UTILITY_RATIO(%), NOTE SIZE (KB),
PROVING KEY SIZE (KB), VERIFYING KEY SIZE (KB), TIME (ms)
— with N_THREADS generalized to the device description.

Reference bench grid: n_inputs in {2,3,4} x n_outputs in {2,5}, depth 26
(bench_utils/mod.rs:40-42).
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
    "NOTE_SIZE_KB", "VK_SIZE_KB", "TIME_MS",
]


def device_description() -> str:
    import jax

    d = jax.devices()[0]
    return f"{d.platform}:{getattr(d, 'device_kind', '?')}x{len(jax.devices())}"


def bench_row(kind: str, fn_name: str, n_in: int, n_out: int, depth: int,
              circuit, note_bytes: int, vk_bytes: int, seconds: float) -> list:
    n = circuit.eval_domain_size()
    gates = circuit.num_gates()
    return [
        kind, device_description(), fn_name, n_in, n_out, depth,
        n, gates, round(100.0 * gates / n, 1),
        round(note_bytes / 1024, 2), round(vk_bytes / 1024, 2),
        round(seconds * 1e3, 1),
    ]


def rows_to_csv(rows) -> str:
    buf = io.StringIO()
    w = csv.writer(buf)
    w.writerow(CSV_HEADER)
    for r in rows:
        w.writerow(r)
    return buf.getvalue()


def run_grid(out_path: str = "/tmp/cap_tpu_benchmark.csv", depth: int = 6,
             shapes=((2, 2),), kinds=("transfer",)):
    """Run a prove+verify grid and write the reference-schema CSV.

    Smaller default grid/depth than the reference's (2,3,4)x(2,5)@26 — pass
    explicit shapes/depth for the full sweep (each extra shape costs a
    preprocess + compile).
    """
    from cap_tpu.proof import transfer as tproof, universal_setup_for_staging
    from cap_tpu.utils.note_serde import transaction_note_to_bytes
    from cap_tpu.utils.params_builder import TransferParamsBuilder
    from cap_tpu.utils.rng import test_rng
    import pickle

    rng = test_rng()
    rows = []
    srs = universal_setup_for_staging(2**16 + 2, "data")
    for (n_in, n_out) in shapes:
        pk, vk = tproof.preprocess(srs, n_in, n_out, depth)
        circ = tproof.dummy_transfer_circuit(n_in, n_out, depth)
        b = TransferParamsBuilder(rng, n_in, n_out, depth, non_native=True,
                                  with_viewer=True)
        note, _, _ = b.build_transfer_note(pk)  # warm
        b2 = TransferParamsBuilder(rng, n_in, n_out, depth, non_native=True,
                                   with_viewer=True)
        t0 = time.time()
        note2, _, _ = b2.build_transfer_note(pk)
        gen_s = time.time() - t0
        t0 = time.time()
        note2.verify(vk, b2.tree.root, timestamp=5)
        ver_s = time.time() - t0
        nb = len(transaction_note_to_bytes(note2))
        vkb = len(pickle.dumps(vk))
        rows.append(bench_row("TRANSFER", "generate", n_in, n_out, depth,
                              circ, nb, vkb, gen_s))
        rows.append(bench_row("TRANSFER", "verify", n_in, n_out, depth,
                              circ, nb, vkb, ver_s))
    out = rows_to_csv(rows)
    with open(out_path, "w") as f:
        f.write(out)
    return out
