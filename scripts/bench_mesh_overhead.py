"""Quantify virtual-mesh overhead: same prove, 1 device vs 8 devices
(VERDICT r3 item 9).

docs/SCALING.md's "near-linear until ~2^12 points/device" claim was an
extrapolation from one-chip compute fractions; this script measures at
least one real point: a full TurboPlonk prove+verify of the same circuit
at the same n on (a) a single CPU device and (b) the 8-virtual-device CPU
mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8), reporting the
collective/launch overhead fraction.  CPU-mesh times do NOT model ICI
bandwidth — the number bounds the framework's own sharding overhead
(layout, collectives scheduling, per-device dispatch), which is what the
virtual mesh can honestly measure.

Run: python scripts/bench_mesh_overhead.py [log2_n]
"""

import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import json

from cap_tpu.utils.rng import test_rng


def build_circuit(log2_n: int):
    """x^5 chain sized to land in domain 2^log2_n."""
    from cap_tpu.plonk.circuit import PlonkCircuit

    rounds = (1 << log2_n) // 6 - 8
    c = PlonkCircuit()
    x = c.load(7)
    for i in range(rounds):
        x5 = c.mul(c.mul(c.mul(x, x), c.mul(x, x)), x)
        x = c.lc_with_constant([x5, x, c.one, c.one], [1, 1, 0, 0], i)
    c.set_variable_public(x)
    return c


def prove_once(pk, c, pubs, rng):
    from cap_tpu.plonk import prover

    t0 = time.time()
    proof = prover.prove(rng, pk, c.witness_values, pubs)
    return time.time() - t0, proof


def main():
    log2_n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    from cap_tpu.ops import msm_signed as ms
    from cap_tpu.parallel import mesh as pm
    from cap_tpu.plonk import prover, verifier
    from cap_tpu.plonk.srs import universal_setup

    # small-domain CPU runs: shrink the MSM chunk so the signed tables stay
    # tiny (the mesh tests do the same); n=256 reuses their cached compiles
    ms.WCHUNK = 128
    os.environ.setdefault("CAP_MSM_TABLE_DISK", "0")

    rng = test_rng()
    c = build_circuit(log2_n)
    fin = c.finalize_for_arithmetization()
    pubs = c.public_input()
    srs = universal_setup(fin.n + 2, rng)
    pk, vk = prover.preprocess(srs, c)
    print(f"circuit n={fin.n}", flush=True)

    # single device
    prove_once(pk, c, pubs, rng)  # warm
    t1, proof1 = prove_once(pk, c, pubs, rng)
    assert verifier.verify(vk, pubs, proof1)
    print(f"1-device prove: {t1:.2f} s", flush=True)

    # 8-device mesh
    mesh = pm.make_mesh(8)
    pm.set_prover_mesh(mesh)
    try:
        prove_once(pk, c, pubs, rng)  # warm (mesh compiles)
        t8, proof8 = prove_once(pk, c, pubs, rng)
    finally:
        pm.set_prover_mesh(None)
    assert verifier.verify(vk, pubs, proof8)
    print(f"8-device prove: {t8:.2f} s", flush=True)
    overhead = t8 / t1 - 1.0
    print(json.dumps({
        "n": fin.n, "t_1dev_s": round(t1, 3), "t_8dev_s": round(t8, 3),
        "mesh_overhead_fraction": round(overhead, 3),
        "note": "virtual CPU mesh: bounds framework sharding overhead, not ICI",
    }))


if __name__ == "__main__":
    main()
