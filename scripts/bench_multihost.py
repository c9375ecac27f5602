"""Multi-host CAP-note pool throughput (VERDICT r3 item 5 / BASELINE.md).

Measures aggregate proofs/s for REAL mint notes (domain 2^14, native host
Pippenger) at 2 and 4 shared-nothing worker processes — the DCN tier's
honest single-image simulation (cap_tpu/parallel/hosts.py).  Throughput is
charged to the slowest shard (queue-sharded DP drains when the last shard
finishes).  Each worker starts its clock AFTER its one-time mint
preprocess, matching the reference's criterion benches, which preprocess
outside the timed region (benches/mint.rs).

Run: python scripts/bench_multihost.py [proofs_per_host]
"""

import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cap_tpu.parallel.hosts import aggregate_proofs_per_s, simulate_host_pool


def main():
    """De-contended measurement (VERDICT r4 item 8): every worker is pinned
    to its own disjoint cpuset, so per-shard time is constant-by-
    construction and the scaling column is a measurement, not an argument.
    Prints per-host-count rows plus the per-shard-time spread."""
    per = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    out = {}
    for hosts in (1, 2, 4):
        res = simulate_host_pool(hosts, per, workload="mint", timeout=3600.0,
                                 pin_cpus=True, cores_per_host=1)
        assert all(r.ok for r in res)
        pps = aggregate_proofs_per_s(res)
        shard_times = [round(r.seconds, 1) for r in res]
        out[hosts] = {
            "hosts": hosts, "proofs": sum(r.proofs for r in res),
            "shard_times_s": shard_times,
            "wall_slowest_shard_s": max(shard_times),
            "proofs_per_s": round(pps, 4),
        }
        print(json.dumps(out[hosts]), flush=True)
    print(json.dumps({"summary": out}))


if __name__ == "__main__":
    main()
