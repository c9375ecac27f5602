"""Proof work queue: pipelining, determinism/idempotence, sharding, retry.

The queue's contract (parallel/queue.py): pipelined proving returns exactly
the proofs serial proving would (same seeded rng streams -> byte-identical
proofs), tasks partition statically across hosts, and a transient failure
is repaired by re-running the idempotent task.

Reference role: rayon's `into_par_iter` note building
(src/utils/params_builder.rs:97-111) and SURVEY.md §5's idempotent-work-unit
service guidance.
"""

import os

import pytest

from cap_tpu.parallel.queue import (
    PreparedProve,
    ProofWorkQueue,
    ProveTask,
    prove_pipelined,
    shard_tasks,
)
from cap_tpu.plonk import prover, verifier
from cap_tpu.plonk.circuit import PlonkCircuit
from cap_tpu.plonk.srs import universal_setup
from cap_tpu.utils.rng import CapRng, test_rng


@pytest.fixture(scope="module", autouse=True)
def host_msm():
    old = os.environ.get("CAP_MSM")
    os.environ["CAP_MSM"] = "host"
    yield
    if old is None:
        os.environ.pop("CAP_MSM", None)
    else:
        os.environ["CAP_MSM"] = old


def _circuit(x0: int):
    c = PlonkCircuit()
    x = c.load(x0)
    for i in range(24):
        x5 = c.mul(c.mul(c.mul(x, x), c.mul(x, x)), x)
        x = c.lc_with_constant([x5, x, c.one, c.one], [1, 1, 0, 0], i)
    c.set_variable_public(x)
    return c


@pytest.fixture(scope="module")
def setup():
    c = _circuit(777)
    fin = c.finalize_for_arithmetization()
    srs = universal_setup(fin.n + 2, test_rng())
    pk, vk = prover.preprocess(srs, c)
    return pk, vk


def _task(setup, i: int) -> ProveTask:
    pk, vk = setup

    def prepare() -> PreparedProve:
        c = _circuit(1000 + i)  # host stage: fresh witness per task
        return PreparedProve(
            plonk_pk=pk, witness_values=c.witness_values,
            pub_inputs=c.public_input(), ext_msg=b"queue",
            rng=CapRng(9000 + i), meta=c.public_input(),
        )

    return ProveTask(task_id=f"t{i}", prepare=prepare, seed=9000 + i)


def test_pipelined_matches_serial_and_verifies(setup):
    pk, vk = setup
    tasks = [_task(setup, i) for i in range(3)]
    results = prove_pipelined(tasks, max_prefetch=2)
    assert [r.task_id for r in results] == ["t0", "t1", "t2"]
    for i, r in enumerate(results):
        assert r.error is None
        # serial reference prove with the same seeded stream
        job = _task(setup, i).prepare()
        want = prover.prove(job.rng, pk, job.witness_values, job.pub_inputs,
                            ext_msg=b"queue")
        assert r.proof.wire_comms == want.wire_comms
        assert r.proof.w_zeta == want.w_zeta
        assert verifier.verify(vk, r.meta, r.proof, ext_msg=b"queue") in (True, None)


def test_shard_tasks_partitions():
    tasks = [ProveTask(task_id=f"t{i}", prepare=lambda: None, seed=i)
             for i in range(10)]
    shards = [shard_tasks(tasks, h, 3) for h in range(3)]
    ids = [t.task_id for s in shards for t in s]
    assert sorted(ids) == sorted(t.task_id for t in tasks)  # exact cover
    assert [t.task_id for t in shards[1]] == ["t1", "t4", "t7"]
    with pytest.raises(ValueError):
        shard_tasks(tasks, 3, 3)


def test_prepare_from_prepared_matches_generate(monkeypatch):
    """TransferNote.generate_non_native == prepare_non_native + prove +
    from_prepared for the same rng stream (the split parallel/queue.py
    pipelines).  The plonk prove is stubbed: this guards the host-side
    refactor (validation order, rng draws, note assembly), not the SNARK."""
    from cap_tpu.plonk import prover as plonk_prover
    from cap_tpu.structs import FeeInput, TxnFeeInfo
    from cap_tpu.transfer import TransferNote
    from cap_tpu.utils.params_builder import TransferParamsBuilder

    calls = []

    def fake_prove(rng, pk, wvals, pubs, ext_msg=None):
        calls.append((list(pubs), ext_msg))
        return ("proof-stub", tuple(pubs))

    monkeypatch.setattr(plonk_prover, "prove", fake_prove)

    class FakePk:
        n_inputs, n_outputs, tree_depth = 2, 2, 2
        plonk_pk = None

    def run(split: bool):
        b = TransferParamsBuilder(CapRng(31337), 2, 2, 2, non_native=True,
                                  with_viewer=True)
        rng = b.rng
        inputs, outputs = b.build_inputs_and_outputs()
        fee_input = FeeInput(b.fee_ro, inputs[0].acc_member_witness, b.users[0])
        fee_info, _ = TxnFeeInfo.new(rng, fee_input, b.fee)
        if split:
            prep = TransferNote.prepare_non_native(
                rng, inputs[1:], outputs, fee_info, b.valid_until, FakePk
            )
            proof = plonk_prover.prove(rng, FakePk.plonk_pk,
                                       prep.witness_values, prep.pub_scalars,
                                       ext_msg=prep.ext_msg)
            return TransferNote.from_prepared(prep, proof)
        return TransferNote.generate_non_native(
            rng, inputs[1:], outputs, fee_info, b.valid_until, FakePk
        )

    note_a, kp_a = run(split=False)
    note_b, kp_b = run(split=True)
    assert note_a == note_b
    assert kp_a.vk == kp_b.vk
    assert calls[0] == calls[1]


def test_queue_retries_transient_failure(setup):
    pk, vk = setup
    q = ProofWorkQueue(max_retries=1)
    boom = {"left": 1}

    def flaky_prepare():
        if boom["left"]:
            boom["left"] -= 1
            raise RuntimeError("transient")
        return _task(setup, 5).prepare()

    q.submit(ProveTask(task_id="flaky", prepare=flaky_prepare, seed=5))
    q.submit(_task(setup, 6))
    results = q.drain()
    assert {r.task_id for r in results} == {"flaky", "t6"}
    for r in results:
        assert r.error is None, r.error
        assert verifier.verify(vk, r.meta, r.proof, ext_msg=b"queue") in (True, None)
