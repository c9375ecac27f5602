"""Multi-host proof-level data parallelism (the DCN tier).

The reference's only parallelism is rayon threads in one address space
(SURVEY.md §2.3); its batch workloads (benches/batch_verification.rs:40-51)
are the natural multi-host shape: proofs are idempotent, shared-nothing
work units.  The DCN tier therefore needs **no collectives at all** — each
host owns a shard of the proof queue and proves independently; the caller
merges the serialized results.  ICI collectives stay *inside* a proof
(parallel/mesh.py); DCN only ever carries whole work items, matching the
scaling-book guidance to keep cross-host traffic off the hot path.

Failure model (SURVEY.md §5 "failure detection / idempotent work units"):
a worker is failed when its process exits nonzero, exceeds the shard
timeout, or produces no parseable report.  Because every shard is
idempotent and shared-nothing, recovery is re-execution: the pool
relaunches the failed shard in a fresh process up to `retries` times —
no partial state is carried over, so a retried shard cannot double-count
or corrupt results.  `fail_at` injects a crash mid-shard for testing the
detection + retry path (the analogue of the reference's witness-mutation
fault injection, SURVEY.md §4.2).

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
    attempts: int = 1


def _worker_main(args) -> None:
    """Entry point inside a worker process: preprocess once, prove `n`
    instances from the host's queue shard, verify each, write a JSON report.

    Workloads:
      toy  — x^5 chain circuit family (fast; default-suite pool tests)
      mint — REAL CAP mint notes (domain 2^14, native host Pippenger) —
             the reference's batch shape (benches/batch_verification.rs:40-51)
             as shared-nothing DP work units (VERDICT r3 item 5)
    """
    os.environ.setdefault("CAP_MSM", "host")
    if args.cpus:
        # disjoint-cpuset pinning (VERDICT r4 item 8): each shard owns its
        # cores, so per-shard time is constant-by-construction and pool
        # scaling = hosts x per-shard rate instead of a contended blur
        cpus = set()
        for part in args.cpus.split(","):
            if "-" in part:
                lo, hi = part.split("-")
                cpus.update(range(int(lo), int(hi) + 1))
            else:
                cpus.add(int(part))
        os.sched_setaffinity(0, cpus)
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache"))

    from cap_tpu.plonk import prover, verifier
    from cap_tpu.plonk.circuit import PlonkCircuit
    from cap_tpu.plonk.srs import universal_setup
    from cap_tpu.utils.rng import CapRng

    rng = CapRng(args.seed.encode())

    if args.workload == "mint":
        from cap_tpu.proof import mint as mproof, universal_setup_for_staging
        from cap_tpu.utils.params_builder import MintParamsBuilder

        depth = 2
        srs = universal_setup_for_staging(2**14 + 2, os.path.join(_REPO, "data"))
        pk, vk = mproof.preprocess(srs, depth)  # preprocess ONCE per host
        t0 = time.time()
        ok = True
        for i in range(args.n):
            if args.fail_at is not None and i == args.fail_at:
                os._exit(17)
            b = MintParamsBuilder(rng, depth, with_viewer=True)
            note, *_ = b.build_mint_note(pk)       # REAL prove
            try:
                note.verify(vk, b.tree.root)        # REAL pairings
            except Exception:
                ok = False
        dt = time.time() - t0
        with open(args.out, "w") as f:
            json.dump({"host": args.host, "proofs": args.n, "seconds": dt,
                       "ok": ok}, f)
        return

    def build(x0: int, rounds: int):
        c = PlonkCircuit()
        x = c.load(x0)
        for i in range(rounds):
            x5 = c.mul(c.mul(c.mul(x, x), c.mul(x, x)), x)
            x = c.lc_with_constant([x5, x, c.one, c.one], [1, 1, 0, 0], i)
        c.set_variable_public(x)
        return c

    c0 = build(12345 + args.host, args.rounds)
    fin = c0.finalize_for_arithmetization()
    srs = universal_setup(fin.n + 2, rng)
    pk, vk = prover.preprocess(srs, c0)

    t0 = time.time()
    ok = True
    for i in range(args.n):
        if args.fail_at is not None and i == args.fail_at:
            # fault injection: die mid-shard without a report
            os._exit(17)
        # each queue item is an independent witness for the host's circuit
        ci = build(1000 * args.host + i + 7, args.rounds)
        pubs = ci.public_input()
        proof = prover.prove(rng, pk, ci.witness_values, pubs)
        ok = ok and bool(verifier.verify(vk, pubs, proof))
    dt = time.time() - t0
    with open(args.out, "w") as f:
        json.dump({"host": args.host, "proofs": args.n, "seconds": dt, "ok": ok}, f)


def _launch_shard(td: str, host: int, attempt: int, proofs_per_host: int,
                  rounds: int, fail_at, workload: str = "toy",
                  cpus: str = "") -> tuple[subprocess.Popen, str]:
    out = os.path.join(td, f"host{host}_try{attempt}.json")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    cmd = [
        sys.executable, "-m", "cap_tpu.parallel.hosts",
        "--worker", "--host", str(host), "--n", str(proofs_per_host),
        "--rounds", str(rounds), "--seed", f"host-pool-{host}",
        "--workload", workload,
        "--out", out,
    ]
    if cpus:
        cmd += ["--cpus", cpus]
    if fail_at is not None:
        cmd += ["--fail-at", str(fail_at)]
    proc = subprocess.Popen(
        cmd, cwd=_REPO, env=env,
        stdout=subprocess.DEVNULL, stderr=subprocess.PIPE,
    )
    return proc, out


def _disjoint_cpusets(n_hosts: int, cores_per_host: int | None = None) -> list[str]:
    """Split the machine's cpus into n disjoint ranges ("a-b" strings); a
    host gets at least one cpu (sets repeat only when hosts > cpus).
    `cores_per_host` fixes the width (for apples-to-apples per-shard times
    across different host counts)."""
    ncpu = os.cpu_count() or 1
    per = cores_per_host or max(1, ncpu // n_hosts)
    out = []
    for h in range(n_hosts):
        lo = (h * per) % ncpu
        hi = min(lo + per - 1, ncpu - 1)
        out.append(f"{lo}-{hi}" if hi > lo else str(lo))
    return out


def simulate_host_pool(
    n_hosts: int, proofs_per_host: int, *, rounds: int = 40,
    timeout: float = 900.0, retries: int = 0, inject_fail_at: dict | None = None,
    workload: str = "toy", pin_cpus: bool = False,
    cores_per_host: int | None = None,
) -> list[HostResult]:
    """Spawn `n_hosts` shared-nothing OS worker processes, each proving its
    own queue shard, and collect per-host reports.

    A shard whose worker dies (nonzero exit, timeout, or missing report) is
    relaunched from scratch — proofs are idempotent work units — up to
    `retries` extra attempts; exhausting them raises.  `inject_fail_at`
    maps host -> item index at which attempt 0 crashes (fault injection;
    later attempts run clean).
    """
    inject_fail_at = inject_fail_at or {}
    cpusets = (_disjoint_cpusets(n_hosts, cores_per_host) if pin_cpus
               else [""] * n_hosts)
    with tempfile.TemporaryDirectory() as td:
        pending = {h: 0 for h in range(n_hosts)}  # host -> attempt counter
        results: dict[int, HostResult] = {}
        while pending:
            procs = {}
            for h, attempt in pending.items():
                fail_at = inject_fail_at.get(h) if attempt == 0 else None
                procs[h] = _launch_shard(
                    td, h, attempt, proofs_per_host, rounds, fail_at,
                    workload=workload, cpus=cpusets[h],
                )
            next_pending = {}
            for h, (p, out) in procs.items():
                attempt = pending[h]
                failure = None
                try:
                    _, err = p.communicate(timeout=timeout)
                    if p.returncode != 0:
                        failure = f"rc={p.returncode}: " + err.decode(
                            errors="replace"
                        )[-2000:]
                except subprocess.TimeoutExpired:
                    p.kill()
                    p.communicate()
                    failure = f"timeout after {timeout}s"
                if failure is None and not os.path.exists(out):
                    failure = "worker exited 0 but wrote no report"
                if failure is not None:
                    if attempt >= retries:
                        raise RuntimeError(
                            f"host {h} shard failed after {attempt + 1} "
                            f"attempt(s): {failure}"
                        )
                    next_pending[h] = attempt + 1
                    continue
                with open(out) as f:
                    rep = json.load(f)
                results[h] = HostResult(
                    rep["host"], rep["proofs"], rep["seconds"], rep["ok"],
                    attempts=attempt + 1,
                )
            pending = next_pending
        return [results[h] for h in sorted(results)]


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
    ap.add_argument("--workload", type=str, default="toy", choices=["toy", "mint"])
    ap.add_argument("--fail-at", type=int, default=None)
    ap.add_argument("--cpus", type=str, default="")
    ap.add_argument("--out", type=str, required=True)
    a = ap.parse_args()
    if not a.worker:
        raise SystemExit("only --worker mode is runnable directly")
    _worker_main(a)
