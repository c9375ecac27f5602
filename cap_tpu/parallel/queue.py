"""Proof work queue: pipelined single-chip throughput + multi-host sharding.

The reference gets multi-proof throughput from rayon data parallelism in one
address space (`utils/params_builder.rs:97-111` builds notes with
`into_par_iter`; SURVEY.md §2.3).  On TPU the equivalent is two-level:

* **Within one host/chip** — a prove is a host stage (witness assembly +
  tape replay + public-input math, ~0.2-0.3 s of Python/C++) followed by a
  device stage (the jitted plonk rounds, ~1.2-1.5 s at 2^15).  The stages
  use disjoint resources, so `prove_pipelined` overlaps them: a single
  prefetch thread prepares witness i+1 while the device proves witness i.
  JAX device syncs and the ctypes tape replayer both release the GIL, so
  the overlap is real, not cooperative.

* **Across hosts (DCN)** — proofs are independent, deterministic work
  units: `ProveTask.seed` fixes the whole rng stream, so re-executing a
  task yields the byte-identical proof (idempotent retry — SURVEY.md §5
  "treat proofs as idempotent work units").  `shard_tasks` gives each host
  its static partition; no coordination traffic is needed beyond shipping
  finished proofs back, and `txn_batch_verify` folds any number of returned
  notes into one multi-pairing.  Elastic recovery = re-issuing the missing
  task ids to any live host.

`ProofWorkQueue` is the host-local orchestrator: submit tasks, drain with
pipelining, retry on transient failure, collect per-task wall times.
"""

from __future__ import annotations

import time
from collections import deque
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Any, Callable, Sequence


@dataclass
class PreparedProve:
    """Everything the device stage needs; produced by the host stage."""

    plonk_pk: Any
    witness_values: Any            # list[int] or (n_vars,16) uint16 ndarray
    pub_inputs: list
    ext_msg: bytes | None
    rng: Any                       # positioned AFTER host-stage draws
    meta: Any = None               # opaque task payload (note fields, ...)


@dataclass
class ProveTask:
    """Deterministic, idempotent unit of proving work.

    `prepare` runs on a host thread and returns a PreparedProve; it must
    derive ALL of its randomness from `seed` (e.g. `CapRng(seed)`) so a
    retried task reproduces the same proof bytes.
    """

    task_id: str
    prepare: Callable[[], PreparedProve]
    seed: int = 0


@dataclass
class ProveResult:
    task_id: str
    proof: Any
    meta: Any
    host_s: float
    device_s: float
    error: Exception | None = None


def _device_prove(job: PreparedProve):
    from cap_tpu.plonk import prover as plonk_prover

    return plonk_prover.prove(
        job.rng, job.plonk_pk, job.witness_values, job.pub_inputs,
        ext_msg=job.ext_msg,
    )


def prove_pipelined(tasks: Sequence[ProveTask], max_prefetch: int = 2,
                    device_prove=_device_prove) -> list[ProveResult]:
    """Prove `tasks` in order, overlapping host witness prep with device
    proving.  The device stage stays strictly serial (one chip, and the
    axon runtime starves under concurrent clients — see .claude verify
    notes), so total wall ≈ max(Σ device, Σ host) + one host stage.
    """
    results: list[ProveResult] = []
    it = iter(tasks)
    pending: deque = deque()

    def submit_next(ex):
        t = next(it, None)
        if t is None:
            return False
        t0 = time.time()
        fut = ex.submit(t.prepare)
        pending.append((t, fut, t0))
        return True

    with ThreadPoolExecutor(max_workers=1) as ex:
        for _ in range(max_prefetch):
            if not submit_next(ex):
                break
        while pending:
            task, fut, t0 = pending.popleft()
            try:
                job = fut.result()
                host_s = time.time() - t0
            except Exception as e:  # host-stage failure: report, keep going
                results.append(ProveResult(task.task_id, None, None, 0.0, 0.0, e))
                submit_next(ex)
                continue
            submit_next(ex)
            d0 = time.time()
            try:
                proof = device_prove(job)
                results.append(ProveResult(
                    task.task_id, proof, job.meta, host_s, time.time() - d0
                ))
            except Exception as e:
                results.append(ProveResult(
                    task.task_id, None, job.meta, host_s, time.time() - d0, e
                ))
    return results


def shard_tasks(tasks: Sequence[ProveTask], host_id: int, n_hosts: int) -> list[ProveTask]:
    """Static round-robin partition of the queue across hosts (DCN data
    parallelism).  Deterministic in task order, so every host agrees on the
    split with zero coordination."""
    if not 0 <= host_id < n_hosts:
        raise ValueError(f"host_id {host_id} outside [0, {n_hosts})")
    return [t for i, t in enumerate(tasks) if i % n_hosts == host_id]


@dataclass
class ProofWorkQueue:
    """Host-local queue with retry.  Tasks are idempotent (seeded rng), so a
    retry after a transient device failure reproduces the identical proof."""

    max_prefetch: int = 2
    max_retries: int = 1
    _tasks: list = field(default_factory=list)

    def submit(self, task: ProveTask) -> None:
        self._tasks.append(task)

    def drain(self) -> list[ProveResult]:
        tasks = self._tasks
        self._tasks = []
        results = prove_pipelined(tasks, self.max_prefetch)
        by_id = {t.task_id: t for t in tasks}
        for attempt in range(self.max_retries):
            failed = [r for r in results if r.error is not None]
            if not failed:
                break
            retries = [by_id[r.task_id] for r in failed]
            fixed = {r.task_id: r for r in prove_pipelined(retries, self.max_prefetch)}
            results = [fixed.get(r.task_id, r) if r.error is not None else r
                       for r in results]
        return results


# ---------------------------------------------------------------------------
# note-level task builders
# ---------------------------------------------------------------------------


def transfer_note_task(task_id: str, seed: int, proving_key,
                       build_prepare: Callable[[Any], Any]) -> ProveTask:
    """Task producing a full TransferNote.  `build_prepare(rng)` runs on the
    host thread with the task's seeded rng and returns a PreparedTransfer
    (e.g. `TransferNote.prepare_non_native(rng, ...)`); assemble finished
    notes with `assemble_transfer_notes`."""

    def prepare() -> PreparedProve:
        from cap_tpu.utils.rng import CapRng

        rng = CapRng(seed)
        prep = build_prepare(rng)
        return PreparedProve(
            plonk_pk=proving_key.plonk_pk,
            witness_values=prep.witness_values,
            pub_inputs=prep.pub_scalars,
            ext_msg=prep.ext_msg,
            rng=rng, meta=prep,
        )

    return ProveTask(task_id=task_id, prepare=prepare, seed=seed)


def assemble_transfer_notes(results: Sequence[ProveResult]):
    """(note, memo_keypair) per successful ProveResult from
    transfer_note_task work units."""
    from cap_tpu.transfer import TransferNote

    out = []
    for r in results:
        if r.error is not None:
            raise r.error
        out.append(TransferNote.from_prepared(r.meta, r.proof))
    return out
