"""Multi-host proof-level data parallelism (DCN tier, parallel/hosts.py).

Two shared-nothing OS worker processes, each proving and verifying its own
queue shard of real TurboPlonk proofs — the process-level simulation of the
reference's batch workloads sharded across hosts (SURVEY.md §2.3;
reference benches/batch_verification.rs:40-51).
"""

from cap_tpu.parallel.hosts import aggregate_proofs_per_s, simulate_host_pool


def test_two_host_pool_proves_and_verifies():
    results = simulate_host_pool(2, 2, rounds=40)
    assert len(results) == 2
    assert all(r.ok for r in results)
    assert sum(r.proofs for r in results) == 4
    pps = aggregate_proofs_per_s(results)
    assert pps > 0


def test_aggregate_uses_slowest_host():
    from cap_tpu.parallel.hosts import HostResult

    rs = [HostResult(0, 4, 2.0, True), HostResult(1, 4, 4.0, True)]
    assert aggregate_proofs_per_s(rs) == 2.0


def test_failed_shard_is_retried_and_recovers():
    """Fault injection: host 1's worker dies mid-shard on attempt 0; the
    pool detects the nonzero exit, relaunches the shard from scratch
    (idempotent work units), and the pool completes (SURVEY.md §5
    failure-detection row)."""
    results = simulate_host_pool(
        2, 2, rounds=40, retries=1, inject_fail_at={1: 1}
    )
    assert [r.host for r in results] == [0, 1]
    assert all(r.ok for r in results)
    assert results[0].attempts == 1
    assert results[1].attempts == 2


def test_exhausted_retries_raise():
    import pytest

    with pytest.raises(RuntimeError, match="host 0 shard failed"):
        simulate_host_pool(1, 2, rounds=40, retries=0, inject_fail_at={0: 0})
