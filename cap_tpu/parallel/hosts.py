"""Multi-host proof-level data parallelism (the DCN tier).

The reference's only parallelism is rayon threads in one address space
(SURVEY.md §2.3); its batch workloads (benches/batch_verification.rs:40-51)
are the natural multi-host shape: proofs are idempotent, shared-nothing
work units.  The DCN tier therefore needs **no collectives at all** — each
host owns a shard of the proof queue and proves independently; the caller
merges the serialized results.  ICI collectives stay *inside* a proof
(parallel/mesh.py); DCN only ever carries whole work items, matching the
scaling-book guidance to keep cross-host traffic off the hot path.

On a real deployment every worker process binds its own chip(s) via the
standard JAX multi-process runtime and this module's pool is the per-host
queue runner.  This image has one chip, so `simulate_host_pool` exercises
the tier honestly as OS processes on the CPU backend: shared-nothing
workers, each with its own SRS/key/queue, reporting aggregate proofs/s.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from dataclasses import dataclass

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@dataclass
class HostResult:
    host: int
    proofs: int
    seconds: float
    ok: bool


def _worker_main(args) -> None:
    """Entry point inside a worker process: build a small circuit family,
    preprocess once, prove `n` instances from the host's queue shard,
    verify each, write a JSON report."""
    os.environ.setdefault("CAP_MSM", "host")  # tiny proofs: host Pippenger
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))

    from cap_tpu.plonk import prover, verifier
    from cap_tpu.plonk.circuit import PlonkCircuit
    from cap_tpu.plonk.srs import universal_setup
    from cap_tpu.utils.rng import CapRng

    def build(x0: int, rounds: int):
        c = PlonkCircuit()
        x = c.load(x0)
        for i in range(rounds):
            x5 = c.mul(c.mul(c.mul(x, x), c.mul(x, x)), x)
            x = c.lc_with_constant([x5, x, c.one, c.one], [1, 1, 0, 0], i)
        c.set_variable_public(x)
        return c

    rng = CapRng(args.seed.encode())
    c0 = build(12345 + args.host, args.rounds)
    fin = c0.finalize_for_arithmetization()
    srs = universal_setup(fin.n + 2, rng)
    pk, vk = prover.preprocess(srs, c0)

    t0 = time.time()
    ok = True
    for i in range(args.n):
        # each queue item is an independent witness for the host's circuit
        ci = build(1000 * args.host + i + 7, args.rounds)
        pubs = ci.public_input()
        proof = prover.prove(rng, pk, ci.witness_values, pubs)
        ok = ok and bool(verifier.verify(vk, pubs, proof))
    dt = time.time() - t0
    with open(args.out, "w") as f:
        json.dump({"host": args.host, "proofs": args.n, "seconds": dt, "ok": ok}, f)


def simulate_host_pool(
    n_hosts: int, proofs_per_host: int, *, rounds: int = 40, timeout: float = 900.0
) -> list[HostResult]:
    """Spawn `n_hosts` shared-nothing OS worker processes, each proving its
    own queue shard, and collect per-host reports.  Raises on worker failure.
    """
    with tempfile.TemporaryDirectory() as td:
        procs = []
        outs = []
        for h in range(n_hosts):
            out = os.path.join(td, f"host{h}.json")
            outs.append(out)
            env = dict(os.environ)
            env["JAX_PLATFORMS"] = "cpu"
            procs.append(
                subprocess.Popen(
                    [
                        sys.executable, "-m", "cap_tpu.parallel.hosts",
                        "--worker", "--host", str(h), "--n", str(proofs_per_host),
                        "--rounds", str(rounds), "--seed", f"host-pool-{h}",
                        "--out", out,
                    ],
                    cwd=_REPO, env=env,
                    stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
                )
            )
        results = []
        for h, (p, out) in enumerate(zip(procs, outs)):
            _, err = p.communicate(timeout=timeout)
            if p.returncode != 0:
                raise RuntimeError(
                    f"host {h} worker failed (rc={p.returncode}): "
                    f"{err.decode(errors='replace')[-2000:]}"
                )
            with open(out) as f:
                rep = json.load(f)
            results.append(HostResult(rep["host"], rep["proofs"], rep["seconds"], rep["ok"]))
        return results


def aggregate_proofs_per_s(results: list[HostResult]) -> float:
    """Aggregate throughput: total proofs / slowest host (queue-sharded DP
    finishes when the last shard drains)."""
    total = sum(r.proofs for r in results)
    wall = max(r.seconds for r in results)
    return total / wall if wall > 0 else float("inf")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--host", type=int, default=0)
    ap.add_argument("--n", type=int, default=1)
    ap.add_argument("--rounds", type=int, default=40)
    ap.add_argument("--seed", type=str, default="host-pool")
    ap.add_argument("--out", type=str, required=True)
    a = ap.parse_args()
    if not a.worker:
        raise SystemExit("only --worker mode is runnable directly")
    _worker_main(a)
